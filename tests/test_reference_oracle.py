"""Numpy oracle of the reference TF graph's forward semantics.

Re-implements myutils.stft/istft (myutils.py:119-147, 181-211) and the
SptAudioGen crop/mask/decode index math (model.py:161-348) directly in
numpy — full complex FFT, py2 division, float truncation — and asserts the
Flax model reproduces it around its learned convolutions:

    encoder input |STFT| tap  == |oracle_stft(x)[enc_ss:enc_tt]|
    separation output tap     == oracle istft(mask * stft[mask_ss:mask_tt])
                                 cropped to [out_ss:out_tt)
    final ambisonics          == oracle decode(weights, biases, separation)
    no-separation path        == oracle mono crop

Unlike the golden-int geometry tests (tests/test_dsp.py:85), this pins the
*semantics*: any future drift in dsp/geometry.py or the DFT ops that golden
constants would miss (e.g. an off-by-one that shifts both sides) breaks the
reconstruction here because the oracle computes from first principles.
"""

import jax
import numpy as np
import pytest

from spatialaudiogen_tpu.models import SptAudioGen, SptAudioGenConfig


# ---------------------------------------------------------------------------
# Oracle: reference myutils.py STFT/ISTFT, numpy, same layout quirks.
# ---------------------------------------------------------------------------

def oracle_stft(x: np.ndarray, wind: int, n_overlap: int) -> np.ndarray:
    """myutils.stft (myutils.py:119-147): 4 offset streams, Hann, full
    complex FFT, frames interleaved offset-major per window."""
    b, n = x.shape
    n_winds = int(np.floor(n / wind)) - 1
    crops = [x[:, ss: ss + wind * n_winds]
             for ss in range(0, wind, wind // n_overlap)]
    xw = np.stack(crops, 1).reshape(b, n_overlap, n_winds, wind)
    hann = 0.5 - 0.5 * np.cos(2 * np.pi / wind * np.arange(wind))
    spec = np.fft.fft((xw * hann).astype(np.complex64), axis=-1)
    spec = spec.transpose(0, 2, 1, 3)  # (B, n_winds, n_overlap, wind)
    return spec.reshape(b, n_winds * n_overlap, wind)


def oracle_istft(spec: np.ndarray, n_overlap: int) -> np.ndarray:
    """myutils.istft (myutils.py:181-211): per-offset iFFT streams,
    shift-trimmed and averaged."""
    b, n_frames, n_freqs = spec.shape
    n_frames = int(int(float(n_frames) / n_overlap) * n_overlap)
    spec = spec[:, :n_frames]
    x = np.real(np.fft.ifft(spec, axis=-1))
    x = x.reshape(b, -1, n_overlap, n_freqs).transpose(0, 2, 1, 3)
    x = x.reshape(b, n_overlap, -1)
    skip = n_freqs // n_overlap
    parts = []
    for i in range(n_overlap):
        if i == 0:
            parts.append(x[:, i, (n_overlap - i - 1) * skip:])
        else:
            parts.append(x[:, i, (n_overlap - i - 1) * skip: -i * skip])
    return sum(parts) / float(n_overlap)


# ---------------------------------------------------------------------------
# Fixtures: a random-weight model + its taps.
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module", params=["unet_mask", "none"])
def model_run(request):
    cfg = SptAudioGenConfig(encoders=("audio",), separation=request.param,
                            sep_num_tracks=3)
    g = cfg.geometry
    model = SptAudioGen(cfg)
    rng = np.random.RandomState(11)
    audio = (rng.randn(2, g.snd_size, g.num_in_channels) * 0.2).astype(np.float32)
    variables = model.init(jax.random.PRNGKey(7), audio, train=False)
    (ambi, ends), inter = model.apply(
        variables, audio, train=False, return_ends=True,
        mutable=["intermediates"])
    return cfg, g, audio, ambi, ends, inter["intermediates"]


def test_encoder_stft_crop_matches_oracle(model_run):
    cfg, g, audio, _, _, inter = model_run
    spec = oracle_stft(audio[:, :, 0], g.wind_size, 4)  # (B, 200, 1024)
    # model.py:166-178: crop [enc_ss, enc_tt) then magnitude
    expected = np.abs(spec[:, g.enc_ss: g.enc_tt])
    got = np.asarray(inter["stft_mag"][0])[:, :, :, 0]  # (B, T_enc, F)
    assert got.shape == expected.shape
    np.testing.assert_allclose(got, expected, atol=2e-3, rtol=1e-4)
    # tight relative agreement on the energetic bins
    big = expected > 1.0
    if big.any():
        np.testing.assert_allclose(got[big], expected[big], rtol=1e-4)


def test_masked_istft_output_matches_oracle(model_run):
    cfg, g, audio, _, ends, inter = model_run
    if cfg.separation != "unet_mask":
        pytest.skip("mask path only")
    mask = np.asarray(inter["separation"]["mask"][0])  # (B, n_in, tr, 28, 1024)
    spec = oracle_stft(audio[:, :, 0], g.wind_size, 4)
    crop = spec[:, g.mask_ss: g.mask_tt]                # (B, 28, 1024)
    b, n_in, tracks = mask.shape[:3]
    expected = np.empty((b, n_in, tracks, g.snd_dur), np.float32)
    for ci in range(n_in):
        for tr in range(tracks):
            masked = crop * mask[:, ci, tr]
            wave = oracle_istft(masked, 4)              # (B, L)
            expected[:, ci, tr] = wave[:, g.out_ss: g.out_tt]
    got = np.asarray(ends["separation"])
    assert got.shape == expected.shape
    np.testing.assert_allclose(got, expected, atol=2e-4)


def test_no_separation_path_matches_oracle(model_run):
    cfg, g, audio, _, ends, _ = model_run
    if cfg.separation != "none":
        pytest.skip("passthrough path only")
    expected = audio[:, g.nosep_ss: g.nosep_ss + g.snd_dur, 0]
    got = np.asarray(ends["separation"])[:, 0, 0]
    np.testing.assert_allclose(got, expected, atol=1e-7)


def test_decoder_matches_oracle(model_run):
    cfg, g, audio, ambi, ends, _ = model_run
    sep = np.asarray(ends["separation"])                # (B, n_in, tr, snd_dur)
    w = np.asarray(ends["localization/weights"])        # (B, snd_dur, out, in, tr)
    bsum = np.asarray(ends["localization/biases"])      # (B, snd_dur, out, in)
    # model.py:430: A_t = sum_i sum_k W[t,o,i,k] * s[i,k,t] + b[t,o,i]
    expected = (np.einsum("btoik,bikt->bto", w, sep)
                + bsum[..., 0])
    np.testing.assert_allclose(np.asarray(ambi), expected, atol=2e-4)


def test_oracle_istft_reconstructs_signal():
    """Sanity: the oracle itself reconstructs (stft -> istft ~ identity/2
    up to stream trimming) — guards against a broken oracle silently
    matching a broken model."""
    rng = np.random.RandomState(0)
    x = rng.randn(1, 8192).astype(np.float32)
    spec = oracle_stft(x, 1024, 4)
    y = oracle_istft(spec, 4)
    # overlap-add of 4 Hann streams averages to ~x/2 over the interior
    lo = 1024
    rel = y[0, lo:-lo] / x[0, 768 + lo: 768 + lo + y.shape[1] - 2 * lo]
    np.testing.assert_allclose(rel, 0.5, atol=1e-3)
