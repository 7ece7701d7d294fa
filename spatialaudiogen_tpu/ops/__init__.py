"""Device compute kernels: matmul-DFT STFT/ISTFT (XLA + Pallas paths)."""

from spatialaudiogen_tpu.ops.dft import (
    stft_real,
    stft_magnitude,
    istft_real,
    istft_from_masked,
)
