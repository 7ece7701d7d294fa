"""Matmul-DFT device path vs jnp.fft reference path."""

import numpy as np

from spatialaudiogen_tpu.dsp import istft, stft
from spatialaudiogen_tpu.ops import istft_from_masked, istft_real, stft_magnitude, stft_real


def test_stft_real_matches_fft():
    rng = np.random.RandomState(0)
    x = rng.randn(2, 2, 3 * 1024 + 50).astype(np.float32)
    ref = np.asarray(stft(x, 1024, 4))
    re, im = stft_real(x, 1024, 4)
    np.testing.assert_allclose(np.asarray(re), ref.real, atol=5e-3)
    np.testing.assert_allclose(np.asarray(im), ref.imag, atol=5e-3)


def test_stft_magnitude():
    rng = np.random.RandomState(1)
    x = rng.randn(3, 2 * 512 + 512).astype(np.float32)
    ref = np.abs(np.asarray(stft(x, 512, 4)))
    got = np.asarray(stft_magnitude(x, 512, 4))
    np.testing.assert_allclose(got, ref, atol=5e-3)


def test_istft_real_matches_fft_path():
    rng = np.random.RandomState(2)
    spec = (rng.randn(2, 16, 256) + 1j * rng.randn(2, 16, 256)).astype(np.complex64)
    ref = np.asarray(istft(spec, 4))
    got = np.asarray(istft_real(spec.real.astype(np.float32), spec.imag.astype(np.float32), 4))
    np.testing.assert_allclose(got, ref, atol=2e-4)


def test_masked_istft_matches_complex_mask_path():
    """Real-mask multiply in (re, im) == complex multiply by cast mask."""
    rng = np.random.RandomState(3)
    spec = (rng.randn(2, 1, 16, 256) + 1j * rng.randn(2, 1, 16, 256)).astype(np.complex64)
    mask = 1 / (1 + np.exp(-rng.randn(2, 8, 16, 256).astype(np.float32)))  # 8 tracks
    ref = np.asarray(istft(spec * mask.astype(np.complex64), 4))
    got = np.asarray(istft_from_masked(
        spec.real.astype(np.float32), spec.imag.astype(np.float32), mask, 4))
    np.testing.assert_allclose(got, ref, atol=2e-4)


def test_full_roundtrip_through_matmul_path():
    """stft_real -> unit mask -> istft_real == 0.5x signal on interior."""
    rng = np.random.RandomState(4)
    wind = 256
    x = rng.randn(1, 10 * wind).astype(np.float32)
    re, im = stft_real(x, wind, 4)
    y = np.asarray(istft_real(re, im, 4))
    hop = wind // 4
    offset = 3 * hop
    lo, hi = wind, y.shape[-1] - wind
    np.testing.assert_allclose(y[:, lo:hi], 0.5 * x[:, offset + lo: offset + hi],
                               atol=2e-3, rtol=1e-2)
