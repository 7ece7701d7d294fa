"""Generic reprojection surface (etl/reproject.py) vs the vrProjector
semantics it replaces (3rd-party/vrProjector)."""

import numpy as np
import pytest

from spatialaudiogen_tpu.etl.reproject import (
    CubemapProjection,
    EquirectangularProjection,
    SideBySideFisheyeProjection,
    angles_to_ray,
    reproject,
)


def _smooth_equirect(h=128, w=256):
    """Low-frequency pattern: roundtrips must reproduce it closely."""
    ys, xs = np.mgrid[0:h, 0:w]
    theta = 2 * np.pi * (xs / w - 0.5)
    phi = np.pi * (ys / h - 0.5)
    img = np.stack([
        0.5 + 0.45 * np.sin(theta) * np.cos(phi),
        0.5 + 0.45 * np.cos(2 * theta) * np.cos(phi),
        0.5 + 0.45 * np.sin(phi),
    ], axis=-1)
    return img.astype(np.float64)


def test_equirect_cubemap_roundtrip():
    src = EquirectangularProjection(_smooth_equirect())
    cube = reproject(src, CubemapProjection, (128, 128))
    assert set(cube.faces) == {"front", "back", "left", "right", "top", "bottom"}
    back = reproject(cube, EquirectangularProjection, (128, 256))
    # poles are singular on any cubemap roundtrip; compare the 60-degree band
    mid = slice(32, 96)
    err = np.abs(back.image[mid] - src.image[mid]).max()
    assert err < 0.02, err


def test_equirect_fisheye_roundtrip():
    src = EquirectangularProjection(_smooth_equirect())
    fish = reproject(src, SideBySideFisheyeProjection, (128, 256))
    back = reproject(fish, EquirectangularProjection, (128, 256))
    mid = slice(32, 96)
    # theta = 0 / +-pi land on each hemisphere circle's RIM, where the
    # orthographic fisheye's radial resolution vanishes (du/dtheta -> 0) —
    # roundtrip error there is inherent to the projection. Compare the
    # interior of each hemisphere (the reference has no roundtrip test at
    # all; vrProjector/test.py only eyeballs outputs).
    cols = np.r_[8:120, 136:248]
    err = np.abs(back.image[mid][:, cols] - src.image[mid][:, cols]).mean()
    assert err < 0.005, err
    rim_err = np.abs(back.image[mid] - src.image[mid]).mean()
    assert rim_err < 0.05, rim_err  # rim included: still bounded


def test_fisheye_validity_circles():
    """Texcoords outside either hemisphere's circle are invalid and render
    black (SideBySideFisheyeProjection.angular_position's None branch)."""
    fish = SideBySideFisheyeProjection(shape=(64, 128))
    u = np.array([0.01, 0.25, 0.51, 0.75, 0.99])
    v = np.array([0.01, 0.5, 0.01, 0.5, 0.01])
    _, _, valid = fish.to_angles(u, v)
    assert list(valid) == [False, True, False, True, False]

    src = EquirectangularProjection(np.ones((64, 128, 3)))
    out = reproject(src, SideBySideFisheyeProjection, (64, 128)).image
    assert out[1, 1].max() == 0.0          # corner: outside both circles
    assert out[32, 32].min() > 0.99        # left-half center: valid
    assert out[32, 96].min() > 0.99        # right-half center: valid


def test_fisheye_angles_match_reference_formulas():
    """Vectorized mapping == the reference's scalar math at sample points
    (SideBySideFisheyeProjection.py:22-71, transcribed here)."""
    import math

    def ref_angular_position(up, v):
        u = 2.0 * (up - 0.5) if up >= 0.5 else 2.0 * up
        if (u - 0.5) ** 2 + (v - 0.5) ** 2 > 0.25:
            return None
        phi = math.asin(2.0 * (v - 0.5))
        theta = math.acos(2.0 * ((1.0 - u) - 0.5) / math.cos(phi))
        if up < 0.5:
            theta -= math.pi
        return theta, phi

    def ref_uv(theta, phi):
        x = math.cos(phi) * math.cos(theta)
        z = math.sin(phi)
        u = 0.5 + x * -0.5
        u = u * 0.5 + 0.5 if theta >= 0 else (1.0 - u) * 0.5
        return u, 0.5 + z * 0.5

    fish = SideBySideFisheyeProjection(shape=(100, 200))
    rng = np.random.RandomState(0)
    us, vs = rng.rand(64), 0.1 + 0.8 * rng.rand(64)
    theta, phi, valid = fish.to_angles(us, vs)
    for k in range(64):
        ref = ref_angular_position(float(us[k]), float(vs[k]))
        if ref is None:
            assert not valid[k]
            continue
        assert valid[k]
        assert abs(theta[k] - ref[0]) < 1e-9
        assert abs(phi[k] - ref[1]) < 1e-9
        # forward direction too
        u2, v2 = ref_uv(*ref)
        rays = angles_to_ray(theta[k], phi[k])
        u_chk = 0.5 + rays[0] * -0.5
        u_chk = u_chk * 0.5 + 0.5 if theta[k] >= 0 else (1.0 - u_chk) * 0.5
        assert abs(u_chk - u2) < 1e-9
        assert abs((0.5 + rays[2] * 0.5) - v2) < 1e-9


def test_cubemap_consistent_with_eac_path():
    """The generic cubemap sampler agrees with the closed-form EAC pipeline's
    shared face math: cube faces rendered from an equirect re-sample to the
    same values the equirect held (away from face seams)."""
    src = EquirectangularProjection(_smooth_equirect())
    cube = reproject(src, CubemapProjection, (96, 96))
    rng = np.random.RandomState(1)
    theta = (rng.rand(200) - 0.5) * 2 * np.pi * 0.98
    phi = (rng.rand(200) - 0.5) * np.pi * 0.6
    got = cube.sample(theta, phi)
    want = src.sample(theta, phi)
    assert np.abs(got - want).max() < 0.02
