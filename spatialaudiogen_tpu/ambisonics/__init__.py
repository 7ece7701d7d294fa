"""Ambisonics DSP library (host numpy + on-device jnp variants).

Capability parity with the reference `pyutils/ambisonics/` package
(/root/reference/pyutils/ambisonics/): AmbiFormat, channel orderings
(ACN/SID/FuMa), normalizations (SN3D/N3D/MaxN), real spherical harmonics,
encoder/decoder, rotations, binauralizers, spherical power maps and the
EMD spatial metric — re-implemented vectorized and TPU-friendly.
"""

from spatialaudiogen_tpu.ambisonics.format import (
    AmbiFormat,
    AmbisonicArray,
    CHANNEL_ORDERING,
    NORMALIZATION,
    DEFAULT_ORDERING,
    DEFAULT_NORMALIZATION,
    degree_order_to_index,
    index_to_degree_order,
    convert_ordering,
    normalization_factor,
)
from spatialaudiogen_tpu.ambisonics.sh import (
    spherical_harmonic_mn,
    spherical_harmonics,
    spherical_harmonics_matrix,
    sh_matrix_polar,
)
from spatialaudiogen_tpu.ambisonics.position import (
    Position,
    PositionalSource,
    MovingSource,
)
from spatialaudiogen_tpu.ambisonics.encoder import AmbiEncoder
from spatialaudiogen_tpu.ambisonics.decoder import AmbiDecoder
from spatialaudiogen_tpu.ambisonics.rotation import foa_rotation_matrix, rotate_foa
