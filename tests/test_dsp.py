"""STFT/ISTFT semantics and crop-geometry golden values."""

import numpy as np
import pytest

from spatialaudiogen_tpu.dsp import ModelGeometry, hann_window, istft, stft, stft_for_loss
from spatialaudiogen_tpu.dsp.stft import frame_count, frame_signal


def _direct_stft(x, wind, n_overlap):
    """Oracle: literal hop-wind/n_overlap DFT loop."""
    hop = wind // n_overlap
    n_frames = n_overlap * (x.shape[-1] // wind - 1)
    win = hann_window(wind)
    out = np.zeros(x.shape[:-1] + (n_frames, wind), dtype=np.complex64)
    for t in range(n_frames):
        out[..., t, :] = np.fft.fft(x[..., t * hop: t * hop + wind] * win, axis=-1)
    return out


def test_stft_matches_direct_loop():
    rng = np.random.RandomState(0)
    x = rng.randn(2, 3, 5279).astype(np.float32)
    got = np.asarray(stft(x, 256, 4))
    ref = _direct_stft(x, 256, 4)
    assert got.shape == ref.shape == (2, 3, frame_count(5279, 256, 4), 256)
    np.testing.assert_allclose(got, ref, atol=2e-4)


def test_frame_positions():
    # frame t must start exactly at t*hop
    n = 4096 + 100
    x = np.arange(n, dtype=np.float32)[None]
    frames = np.asarray(frame_signal(x, 512, 4))
    for t in range(frames.shape[1]):
        np.testing.assert_array_equal(frames[0, t], x[0, t * 128: t * 128 + 512])


def test_istft_reconstruction_scale():
    """Unit mask: istft(stft(x)) == 0.5 * x on the aligned interior.

    The reference ISTFT averages the n_overlap analysis streams without
    dividing by the Hann overlap sum (=2 at 4x overlap), so a unit mask
    returns the signal scaled by 0.5 (myutils.py:205).
    """
    rng = np.random.RandomState(1)
    wind, n_overlap = 512, 4
    x = rng.randn(2, 8 * wind + 13).astype(np.float32)
    spec = stft(x, wind, n_overlap)
    y = np.asarray(istft(spec, n_overlap))
    hop = wind // n_overlap
    offset = (n_overlap - 1) * hop  # output sample 0 == input sample offset
    n_winds = spec.shape[-2] // n_overlap
    out_len = n_winds * wind - (n_overlap - 1) * hop
    assert y.shape == (2, out_len)
    # interior region (first/last window partially covered by fewer streams)
    lo, hi = wind, out_len - wind
    np.testing.assert_allclose(y[:, lo:hi], 0.5 * x[:, offset + lo: offset + hi],
                               atol=2e-3, rtol=1e-3)


def test_istft_leading_batch_dims():
    rng = np.random.RandomState(2)
    spec = (rng.randn(2, 3, 4, 8, 64) + 1j * rng.randn(2, 3, 4, 8, 64)).astype(np.complex64)
    y4 = np.asarray(istft(spec, 4))
    y_flat = np.asarray(istft(spec.reshape(24, 8, 64), 4)).reshape(2, 3, 4, -1)
    np.testing.assert_allclose(y4, y_flat, atol=1e-6)


def test_stft_for_loss_shapes_and_values():
    """Mirrors myutils.py:151-178: window 1200 -> 2048, 2x overlap, stream-major."""
    rng = np.random.RandomState(3)
    x = rng.randn(2, 4800, 3).astype(np.float32)
    got = np.asarray(stft_for_loss(x, 1200, 2))
    assert got.shape == (2, 3, 3, 2048)  # 2 frames stream-0 + 1 frame stream-1
    win = hann_window(2048)
    ref0 = np.fft.fft(x[:, 0:2048, :].transpose(0, 2, 1) * win)
    ref1 = np.fft.fft(x[:, 2048:4096, :].transpose(0, 2, 1) * win)
    ref2 = np.fft.fft(x[:, 1024:3072, :].transpose(0, 2, 1) * win)
    np.testing.assert_allclose(got[:, :, 0], ref0, atol=2e-3)
    np.testing.assert_allclose(got[:, :, 1], ref1, atol=2e-3)
    np.testing.assert_allclose(got[:, :, 2], ref2, atol=2e-3)


def test_geometry_default_golden_values():
    g = ModelGeometry()
    assert g.snd_contx == 48000
    assert g.snd_dur == 4800
    assert g.snd_size == 52799
    assert g.wind_size == 1024
    assert g.n_stft_frames == 200
    assert (g.enc_ss, g.enc_tt) == (46, 173)
    assert g.n_enc_frames == 127
    assert (g.mask_ss, g.mask_tt) == (89, 117)
    assert g.n_mask_frames == 28
    assert (g.deconv_ss, g.deconv_tt) == (43, 71)
    assert (g.out_ss, g.out_tt) == (448, 5248)
    assert g.nosep_ss == 24000
    assert g.target_ss == 24000
    assert g.metric_window == 1200
    assert g.num_in_channels == 1 and g.num_out_channels == 3


def test_geometry_istft_crop_consistency():
    """The istft output crop must land the prediction window exactly.

    Output sample 0 of istft(spec[mask_ss:mask_tt]) corresponds to signal
    sample mask_ss*hop + 3*hop; the crop [out_ss:out_tt) must therefore map to
    signal samples [snd_contx/2, snd_contx/2 + snd_dur).
    """
    g = ModelGeometry()
    istft_origin = g.mask_ss * g.hop + 3 * g.hop
    assert istft_origin + g.out_ss == g.snd_contx // 2
    # and the crop fits inside the istft output
    n_winds = g.n_mask_frames // 4
    out_len = n_winds * g.wind_size - 3 * g.hop
    assert g.out_tt <= out_len


def test_geometry_alternate_rates():
    # 24 kHz: wind = 2^round(log2(600)) = 512
    g = ModelGeometry(audio_rate=24000, video_rate=10)
    assert g.wind_size == 512
    assert g.snd_size == 24000 + 2400 - 1
    istft_origin = g.mask_ss * g.hop + 3 * g.hop
    assert istft_origin + g.out_ss == g.snd_contx // 2


@pytest.mark.parametrize("wind,overlap", [(256, 4), (1024, 4)])
def test_istft_of_masked_stft_matches_tf_semantics(wind, overlap):
    """Non-trivial mask path: compare istft against a literal per-stream oracle."""
    rng = np.random.RandomState(4)
    n_frames = 8 * overlap
    spec = (rng.randn(3, n_frames, wind) + 1j * rng.randn(3, n_frames, wind)).astype(np.complex64)
    got = np.asarray(istft(spec, overlap))

    x = np.fft.ifft(spec, axis=-1).real                  # (B, T, F)
    streams = [x[:, k::overlap].reshape(3, -1) for k in range(overlap)]
    skip = wind // overlap
    trimmed = []
    for i in range(overlap):
        s = streams[i]
        start = (overlap - 1 - i) * skip
        end = s.shape[1] - i * skip
        trimmed.append(s[:, start:end])
    ref = np.sum(trimmed, axis=0) / overlap
    np.testing.assert_allclose(got, ref, atol=1e-5)
