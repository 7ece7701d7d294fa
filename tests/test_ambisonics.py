"""Golden-value tests for the ambisonics math core."""

import numpy as np
import pytest

from spatialaudiogen_tpu.ambisonics import (
    AmbiDecoder,
    AmbiEncoder,
    AmbiFormat,
    AmbisonicArray,
    Position,
    convert_ordering,
    degree_order_to_index,
    foa_rotation_matrix,
    index_to_degree_order,
    normalization_factor,
    rotate_foa,
    spherical_harmonics_matrix,
)
from spatialaudiogen_tpu.ambisonics.sh import sh_matrix_polar, sh_matrix_polar_jnp


def test_acn_index_roundtrip():
    for ordering in ("ACN", "SID", "FURSE_MALHAM"):
        for n in range(4):
            for m in range(-n, n + 1):
                idx = degree_order_to_index(n, m, ordering)
                assert 0 <= idx < 16
                assert index_to_degree_order(idx, ordering) == (n, m)


def test_acn_order1_layout():
    # ACN order-1: [W, Y, Z, X] = [(0,0), (1,-1), (1,0), (1,1)]
    assert [index_to_degree_order(i, "ACN") for i in range(4)] == [
        (0, 0), (1, -1), (1, 0), (1, 1)]
    # FuMa order-1: [W, X, Y, Z]
    assert degree_order_to_index(1, 1, "FURSE_MALHAM") == 1   # X
    assert degree_order_to_index(1, -1, "FURSE_MALHAM") == 2  # Y
    assert degree_order_to_index(1, 0, "FURSE_MALHAM") == 3   # Z


def test_sn3d_order1_golden():
    """FOA ACN/SN3D at (phi, nu): [1, sin(phi)cos(nu), sin(nu), cos(phi)cos(nu)]."""
    rng = np.random.RandomState(0)
    phi = rng.uniform(-np.pi, np.pi, 16)
    nu = rng.uniform(-np.pi / 2, np.pi / 2, 16)
    y = sh_matrix_polar(phi, nu, 1)
    expected = np.stack(
        [np.ones_like(phi), np.sin(phi) * np.cos(nu), np.sin(nu), np.cos(phi) * np.cos(nu)], axis=1)
    np.testing.assert_allclose(y, expected, atol=1e-12)


def test_jnp_sh_matches_scipy_up_to_order3():
    rng = np.random.RandomState(1)
    phi = rng.uniform(-np.pi, np.pi, 32)
    nu = rng.uniform(-np.pi / 2, np.pi / 2, 32)
    for order in range(4):
        ref = sh_matrix_polar(phi, nu, order)
        got = np.asarray(sh_matrix_polar_jnp(phi, nu, order))
        np.testing.assert_allclose(got, ref, atol=1e-5)


def test_normalization_factors():
    assert normalization_factor(0, "ACN", "SN3D") == pytest.approx(1.0)
    assert normalization_factor(0, "ACN", "MAX_N") == pytest.approx(1 / np.sqrt(2))
    assert normalization_factor(1, "ACN", "N3D") == pytest.approx(np.sqrt(3 / (4 * np.pi)))
    # SN3D degree-2 m=2: sqrt(2 * 0! / 4!) = sqrt(1/12)
    idx = degree_order_to_index(2, 2, "ACN")
    assert normalization_factor(idx, "ACN", "SN3D") == pytest.approx(np.sqrt(2 / 24.0))


def test_encode_decode_pseudoinv_roundtrip():
    """Encoding a source and pseudoinv-decoding at the same position recovers it."""
    rng = np.random.RandomState(2)
    fmt = AmbiFormat(order=1, sample_rate=1000)
    pos = Position(0.3, 0.2, 1.0, "polar")
    sig = rng.randn(256)
    amb = AmbiEncoder(fmt).encode(PositionalSourceAt(sig, pos))
    assert amb.data.shape == (256, 4)
    dec = AmbiDecoder([pos], fmt, method="pseudoinv").decode(amb.data)
    # projection of a single source onto its own SH direction is lossy in
    # general, but pinv on the 1x4 system returns the min-norm solution which
    # reproduces the signal up to the SH row norm scaling; verify consistency:
    y = spherical_harmonics_matrix([pos], 1)
    expected = amb.data @ np.linalg.pinv(y)
    np.testing.assert_allclose(dec, expected, atol=1e-12)


def PositionalSourceAt(sig, pos):
    from spatialaudiogen_tpu.ambisonics.position import PositionalSource

    return PositionalSource(sig, pos, 1000)


def test_encode_matches_manual_projection():
    rng = np.random.RandomState(3)
    fmt = AmbiFormat(order=1, sample_rate=1000)
    pos = Position(-1.1, 0.4, 1.0, "polar")
    sig = rng.randn(100)
    amb = AmbiEncoder(fmt).encode(PositionalSourceAt(sig, pos))
    y = spherical_harmonics_matrix([pos], 1)[0]
    np.testing.assert_allclose(amb.data, sig[:, None] * y[None, :], atol=1e-12)


def test_foa_rotation_matches_sh_of_rotated_position():
    """Rotating the FOA signal == encoding from the azimuth-rotated position."""
    rng = np.random.RandomState(4)
    fmt = AmbiFormat(order=1, sample_rate=1000)
    for angle in (-2.0, -0.5, 0.7, 3.0):
        pos = Position(0.4, -0.3, 1.0, "polar")
        sig = rng.randn(64)
        amb = AmbiEncoder(fmt).encode(PositionalSourceAt(sig, pos)).data
        rotated = rotate_foa(amb, angle)
        # The feeder's matrix maps signals as if the scene rotated by -angle
        # around z in source terms: Y' = X sin + Y cos, X' = X cos - Y sin.
        pos2 = Position(pos.phi + angle, pos.nu, 1.0, "polar")
        expected = AmbiEncoder(fmt).encode(PositionalSourceAt(sig, pos2)).data
        np.testing.assert_allclose(rotated, expected, atol=1e-10)


def test_ordering_and_normalization_conversion():
    rng = np.random.RandomState(5)
    data = rng.randn(50, 4)
    arr = AmbisonicArray(data.copy(), AmbiFormat(order=1, sample_rate=100))
    arr.convert(ordering="FURSE_MALHAM")
    # ACN [W,Y,Z,X] -> FuMa [W,X,Y,Z]
    np.testing.assert_allclose(arr.data, data[:, [0, 3, 1, 2]])
    arr.convert(ordering="ACN")
    np.testing.assert_allclose(arr.data, data)
    arr.convert(normalization="N3D")
    facs = np.array([normalization_factor(i, "ACN", "N3D") / normalization_factor(i, "ACN", "SN3D")
                     for i in range(4)])
    np.testing.assert_allclose(arr.data, data * facs, atol=1e-12)


def test_moving_source_trajectory_matches_tic():
    from spatialaudiogen_tpu.ambisonics.position import MovingSource

    rng = np.random.RandomState(6)
    sig = rng.randn(200)
    pts = [Position(p, n, 1.0, "polar") for p, n in [(-1, 0.1), (0.5, -0.2), (2.0, 0.4)]]
    src = MovingSource(sig, pts, rate=100)
    traj = src.trajectory()
    ticked = []
    while src.tic():
        ticked.append(src.position.coords("polar").copy())
    ticked = np.array(ticked)
    np.testing.assert_allclose(traj, ticked, atol=1e-9)


def test_encode_routes_moving_sources():
    """encode(MovingSource) must follow the trajectory, not the placeholder.

    The reference (encoder.py:10-22) silently encodes a moving source at its
    uninitialized position (0,0,0) unless the caller runs the tic() loop;
    here encode() delegates to encode_moving and mixed lists sum per kind.
    """
    from spatialaudiogen_tpu.ambisonics.position import MovingSource, PositionalSource

    rng = np.random.RandomState(7)
    rate = 100
    sig = rng.randn(300)
    pts = [Position(p, 0.0, 1.0, "polar") for p in (-1.0, 0.5, 2.0)]
    fmt = AmbiFormat(order=1, sample_rate=rate)
    enc = AmbiEncoder(fmt)
    moving = enc.encode(MovingSource(sig, pts, rate)).data
    np.testing.assert_allclose(
        moving, enc.encode_moving(MovingSource(sig, pts, rate)).data)
    assert (moving[:, 1] ** 2).mean() > 1e-3  # Y carries the sweep
    static = PositionalSource(0.5 * sig, Position(0, 0, 1, "cartesian"), rate)
    mixed = enc.encode([MovingSource(sig, pts, rate), static]).data
    np.testing.assert_allclose(mixed, moving + enc.encode(static).data)


def test_rotation_matrix_orthonormal():
    for a in (-3.0, 0.0, 1.5):
        r = foa_rotation_matrix(a)
        np.testing.assert_allclose(r @ r.T, np.eye(4), atol=1e-12)


def test_sh_rotation_z_order1_matches_foa():
    from spatialaudiogen_tpu.ambisonics.rotation import sh_rotation_z

    for a in (-2.0, 0.7):
        np.testing.assert_allclose(sh_rotation_z(1, a), foa_rotation_matrix(a),
                                   atol=1e-12)


def test_sh_rotation_z_order3_matches_rotated_encoding():
    """Rotating an order-3 signal == encoding from the rotated azimuth."""
    from spatialaudiogen_tpu.ambisonics.position import PositionalSource
    from spatialaudiogen_tpu.ambisonics.rotation import rotate_ambisonics, sh_rotation_z

    rng = np.random.RandomState(7)
    sig = rng.randn(32)
    fmt = AmbiFormat(order=3, sample_rate=1000)
    for angle in (-1.3, 0.4, 2.9):
        pos = Position(0.3, -0.2, 1.0, "polar")
        amb = AmbiEncoder(fmt).encode(PositionalSource(sig, pos, 1000)).data
        rotated = rotate_ambisonics(amb, angle)
        pos2 = Position(pos.phi + angle, pos.nu, 1.0, "polar")
        expected = AmbiEncoder(fmt).encode(PositionalSource(sig, pos2, 1000)).data
        np.testing.assert_allclose(rotated, expected, atol=1e-9)
        # orthonormal
        r = sh_rotation_z(3, angle)
        np.testing.assert_allclose(r @ r.T, np.eye(16), atol=1e-12)
