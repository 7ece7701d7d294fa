"""Tests for the native EMD solver and spherical map metrics."""

import numpy as np
import pytest

from spatialaudiogen_tpu.ambisonics.emd import (
    _emd_hat_linprog,
    _load_native,
    ambix_emd,
    emd_hat,
    mesh_ground_distance,
)
from spatialaudiogen_tpu.ambisonics.maps import spherical_mesh


def test_native_lib_builds():
    assert _load_native() is not None, "native EMD library failed to build"


def test_emd_identity_is_zero():
    rng = np.random.RandomState(0)
    p = rng.rand(20)
    d = rng.rand(20, 20)
    d = (d + d.T) / 2
    np.fill_diagonal(d, 0.0)
    assert emd_hat(p, p, d) == pytest.approx(0.0, abs=1e-9)


def test_emd_simple_transport():
    # Move 1 unit of mass across distance 2: EMD = 2.
    p = np.array([1.0, 0.0])
    q = np.array([0.0, 1.0])
    d = np.array([[0.0, 2.0], [2.0, 0.0]])
    assert emd_hat(p, q, d) == pytest.approx(2.0)


def test_emd_unbalanced_penalty():
    # 1 extra unit of unmatched mass penalized at max distance (pyemd default).
    p = np.array([2.0, 0.0])
    q = np.array([0.0, 1.0])
    d = np.array([[0.0, 3.0], [3.0, 0.0]])
    # transport 1 unit over distance 3 + 1 unmatched * max(d)=3
    assert emd_hat(p, q, d) == pytest.approx(6.0)


def test_native_matches_linprog():
    rng = np.random.RandomState(1)
    for _ in range(5):
        n = 12
        p = rng.rand(n)
        q = rng.rand(n)
        pts = rng.randn(n, 3)
        pts /= np.linalg.norm(pts, axis=1, keepdims=True)
        d = np.arccos(np.clip(pts @ pts.T, -1, 1))
        native = emd_hat(p, q, d)
        lp = _emd_hat_linprog(p, q, d)
        assert native == pytest.approx(lp, rel=1e-6, abs=1e-8)


def test_ambix_emd_same_vs_different():
    """Same-signal EMD ~ 0; spatially different signals give EMD > 0
    (pattern of reference distance.py test_ambix_emd)."""
    from spatialaudiogen_tpu.ambisonics import AmbiEncoder, AmbiFormat, Position
    from spatialaudiogen_tpu.ambisonics.position import PositionalSource

    rate = 2000
    rng = np.random.RandomState(2)
    sig = rng.randn(rate)  # 1 second
    fmt = AmbiFormat(order=1, sample_rate=rate)
    left = AmbiEncoder(fmt).encode(PositionalSource(sig, Position(np.pi / 2, 0, 1, "polar"), rate)).data
    right = AmbiEncoder(fmt).encode(PositionalSource(sig, Position(-np.pi / 2, 0, 1, "polar"), rate)).data

    same_dir, same_pow = ambix_emd(left, left, rate, ang_res=30)
    diff_dir, diff_pow = ambix_emd(left, right, rate, ang_res=30)
    assert same_dir == pytest.approx(0.0, abs=1e-9)
    assert same_pow == pytest.approx(0.0, abs=1e-9)
    assert diff_dir > 0.05
    assert diff_pow > 0.05


def test_mesh_ground_distance_range():
    phi, nu = spherical_mesh(30)
    d = mesh_ground_distance(phi, nu)
    assert d.shape[0] == phi.size
    # arccos near 1.0 has sqrt(eps) absolute error; that is inherent.
    assert np.allclose(np.diag(d), 0, atol=1e-6)
    assert d.max() <= np.pi + 1e-9


def test_tdesign_exactness():
    from spatialaudiogen_tpu.ambisonics.tdesigns import (
        ICOSAHEDRON,
        OCTAHEDRON,
        design_residual,
        get_tdesign,
    )

    assert design_residual(OCTAHEDRON, 1) < 1e-12
    assert design_residual(ICOSAHEDRON, 2) < 1e-12
    pts = get_tdesign(3)  # numerically optimized 32-point design
    assert pts.shape == (32, 3)
    np.testing.assert_allclose(np.linalg.norm(pts, axis=1), 1.0, atol=1e-6)
    assert design_residual(pts, 3) < 1e-5
