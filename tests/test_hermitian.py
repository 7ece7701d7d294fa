"""Hermitian half-spectrum path must match the full-bin formulation exactly."""

import jax
import jax.numpy as jnp
import numpy as np

from spatialaudiogen_tpu.models import SptAudioGen, SptAudioGenConfig
from spatialaudiogen_tpu.ops.dft import (
    fold_hermitian_mask,
    istft_from_masked,
    istft_from_masked_hermitian,
    mirror_hermitian_magnitude,
    stft_real,
)


def test_half_stft_matches_full():
    rng = np.random.RandomState(0)
    x = rng.randn(2, 5 * 256 + 32).astype(np.float32)
    re_f, im_f = stft_real(x, 256, 4)
    re_h, im_h = stft_real(x, 256, 4, half=True)
    np.testing.assert_allclose(np.asarray(re_h), np.asarray(re_f)[..., :129], atol=5e-5)
    np.testing.assert_allclose(np.asarray(im_h), np.asarray(im_f)[..., :129], atol=5e-5)
    mag_full = np.sqrt(np.asarray(re_f) ** 2 + np.asarray(im_f) ** 2)
    mag_h = jnp.sqrt(re_h ** 2 + im_h ** 2)
    np.testing.assert_allclose(np.asarray(mirror_hermitian_magnitude(mag_h)),
                               mag_full, atol=1e-4)


def test_fold_mask():
    m = jnp.arange(8.0)[None, None]
    folded = np.asarray(fold_hermitian_mask(m))[0, 0]
    np.testing.assert_allclose(folded, [0, 1 + 7, 2 + 6, 3 + 5, 4])


def test_masked_istft_hermitian_matches_full():
    rng = np.random.RandomState(1)
    n = 256
    x = rng.randn(2, 6 * n).astype(np.float32)
    re, im = stft_real(x, n, 4)
    re_h, im_h = re[..., : n // 2 + 1], im[..., : n // 2 + 1]
    mask = 1 / (1 + np.exp(-rng.randn(2, 3, re.shape[-2], n).astype(np.float32)))
    full = np.asarray(istft_from_masked(re[:, None], im[:, None], mask, 4))
    half = np.asarray(istft_from_masked_hermitian(re_h[:, None], im_h[:, None],
                                                  mask, 4, n_freqs=n))
    np.testing.assert_allclose(half, full, atol=2e-4)


def test_model_outputs_identical_both_paths():
    cfg_h = SptAudioGenConfig(encoders=("audio",), separation="unet_mask",
                              sep_num_tracks=4, hermitian_dft=True)
    cfg_f = SptAudioGenConfig(encoders=("audio",), separation="unet_mask",
                              sep_num_tracks=4, hermitian_dft=False)
    g = cfg_h.geometry
    rng = np.random.RandomState(2)
    audio = jnp.asarray(rng.randn(1, g.snd_size, 1), jnp.float32)
    model_h, model_f = SptAudioGen(cfg_h), SptAudioGen(cfg_f)
    variables = model_h.init(jax.random.PRNGKey(0), audio, train=False)
    out_h = model_h.apply(variables, audio, train=False)
    out_f = model_f.apply(variables, audio, train=False)
    np.testing.assert_allclose(np.asarray(out_h), np.asarray(out_f),
                               atol=2e-4, rtol=1e-4)
