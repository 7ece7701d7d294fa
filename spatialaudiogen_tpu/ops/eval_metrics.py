"""Device twins of the host eval metrics: mel-LSD and Hilbert-envelope
distance as MXU matmuls.

With these (+ ops/sinkhorn.py for EMD) the entire reference eval battery
(eval.py:125-132) runs on-chip: `sag-eval --device_metrics --emd sinkhorn`
leaves the host nothing but feeding and file writes. Semantics mirror
eval/host_metrics.py (itself pinned to the reference's librosa/scipy
calls, myutils.py:96-116):

  * mel-LSD: centered power spectrogram (n_fft 2048, hop 512, periodic
    hann, reflect pad) as a framed real-DFT MATMUL (no FFT op — axon has
    none), Slaney mel filterbank, 10*log10(. + 1e-2), RMS of the dB
    difference.
  * envelope distance: the Hilbert transform of a length-T real signal is
    a CIRCULANT linear operator (kernel Im(ifft(u)), u the analytic-signal
    spectral mask), so |hilbert(x)| = sqrt(x^2 + (H @ x)^2) costs one
    (T, T) matmul — 4800x4800 f32 is 92 MB of basis, read once per batch.

Agreement with the f64 host implementations is pinned in
tests/test_eval_metrics_device.py (~1e-3 dB / ~1e-5 absolute).
"""

from __future__ import annotations

import functools

import numpy as np

from spatialaudiogen_tpu.dsp.stft import hann_window
from spatialaudiogen_tpu.eval.host_metrics import mel_filterbank
from spatialaudiogen_tpu.ops.dft import _half_basis

N_FFT = 2048
HOP = 512
N_MELS = 128
FMAX = 12000.0
EPS = 1e-2  # myutils.py:103 log floor


@functools.lru_cache(maxsize=4)
def _dft_mats(n_fft: int = N_FFT):
    """Real-DFT bases (n_fft, n_fft//2+1) from the shared matmul-DFT path
    (ops/dft.py), with the periodic hann folded in (power spectra are
    sign-of-angle invariant, so the half bases serve directly)."""
    cos_kn, sin_kn = _half_basis(n_fft)
    win = hann_window(n_fft).astype(np.float32)
    return ((cos_kn.T * win[:, None]).astype(np.float32),
            (sin_kn.T * win[:, None]).astype(np.float32))


@functools.lru_cache(maxsize=4)
def _hilbert_kernel(t: int) -> np.ndarray:
    """(T, T) circulant Hilbert-transform matrix (scipy.signal.hilbert's
    Im part: analytic = ifft(fft(x) * u), u = [1, 2...2, 1, 0...0])."""
    u = np.zeros(t)
    u[0] = 1.0
    if t % 2 == 0:
        u[1: t // 2] = 2.0
        u[t // 2] = 1.0
    else:
        u[1: (t + 1) // 2] = 2.0
    k = np.fft.ifft(u).imag  # response to a delta at n=0
    idx = (np.arange(t)[:, None] - np.arange(t)[None, :]) % t
    return k[idx].astype(np.float32)


def mel_lsd_batch_fn(rate: int, n_mels: int = N_MELS, fmax: float = FMAX):
    """Jittable (pred, gt) -> (B, C) per-channel mel-LSD.

    pred/gt: (B, T, C). Matches eval/host_metrics.compute_mel_lsd
    (reference myutils.py:96-106) to ~1e-3 dB: reflect-centered frames,
    framed real-DFT power via two HIGHEST-precision matmuls, Slaney mel
    filterbank, RMS over (mel, frame) of the dB difference.
    """
    import jax.numpy as jnp
    from jax import lax

    cos_np, sin_np = _dft_mats(N_FFT)
    fb_np = mel_filterbank(rate, N_FFT, n_mels, 0.0, fmax).astype(np.float32)
    pad = N_FFT // 2

    def mel_db(x):
        # x: (B, T, C) -> (B, F, n_mels, C) in dB
        cos_m, sin_m = jnp.asarray(cos_np), jnp.asarray(sin_np)
        fb = jnp.asarray(fb_np)
        # host twin pads constant when the signal is shorter than the pad
        # (host_metrics._stft_power; reflect would raise there and here)
        mode = "reflect" if x.shape[1] > pad else "constant"
        xp = jnp.pad(x, ((0, 0), (pad, pad), (0, 0)), mode=mode)
        n_frames = 1 + (xp.shape[1] - N_FFT) // HOP
        frames = jnp.stack([xp[:, i * HOP: i * HOP + N_FFT] for i in
                            range(n_frames)], axis=1)      # (B, F, W, C)
        re = jnp.einsum("bfwc,wk->bfkc", frames, cos_m,
                        precision=lax.Precision.HIGHEST)
        im = jnp.einsum("bfwc,wk->bfkc", frames, sin_m,
                        precision=lax.Precision.HIGHEST)
        power = re * re + im * im
        mel = jnp.einsum("bfkc,mk->bfmc", power, fb,
                         precision=lax.Precision.HIGHEST)
        return 10.0 * jnp.log10(mel + EPS)

    def metric(pred, gt):
        diff = mel_db(pred) - mel_db(gt)
        return jnp.sqrt(jnp.mean(diff * diff, axis=(1, 2)))  # (B, C)

    return metric


def envelope_dist_fn(t: int):
    """Jittable (pred, gt) -> (B, C) Hilbert-envelope RMS distance.

    Matches eval/host_metrics.compute_envelope_dist (myutils.py:109-116):
    envelope = sqrt(x^2 + (Hx)^2) with H the circulant Hilbert matrix.
    """
    import jax.numpy as jnp
    from jax import lax

    h_np = _hilbert_kernel(t)

    def metric(pred, gt):
        h = jnp.asarray(h_np)

        def env(x):
            hx = jnp.einsum("nm,bmc->bnc", h, x,
                            precision=lax.Precision.HIGHEST)
            return jnp.sqrt(x * x + hx * hx)

        d = env(pred) - env(gt)
        return jnp.sqrt(jnp.mean(d * d, axis=1))  # (B, C)

    return metric
