"""STFT/ISTFT as real matmuls against DFT basis matrices (TPU compute path).

The axon TPU backend has no FFT op, and even where XLA FFT exists a
1024-point DFT expressed as (frames, 1024) x (1024, 1024) matmuls maps
straight onto the MXU and lets XLA fuse the Hann window, magnitude, mask
and overlap-add around it. Since the model's separation mask is real
(sigmoid, reference model.py:334), the full STFT -> mask -> ISTFT pipeline
needs no complex dtype at all:

  forward:  Re = (x*w) @ C,  Im = (x*w) @ S     with C/S = cos/sin(-2pi kn/N)
  inverse:  real(ifft(X))_n = (1/N) * (Re @ C + Im @ S)   (same matrices,
            using cos symmetry and sin(-a) = -sin(a))

Numerical parity with jnp.fft is ~1e-3 absolute in float32 at N=1024, which
the round-trip tests pin down.
"""

from __future__ import annotations

import functools

import numpy as np

from spatialaudiogen_tpu.dsp.stft import frame_signal, hann_window


@functools.lru_cache(maxsize=8)
def _basis(wind_size: int):
    k = np.arange(wind_size)
    ang = -2.0 * np.pi * np.outer(k, k) / wind_size
    return np.cos(ang).astype(np.float32), np.sin(ang).astype(np.float32)


def frame_signal_range(x, wind_size: int, n_overlap: int, t0: int, n_frames: int):
    """Frames [t0, t0+n_frames) of the hop=wind/n_overlap framing of x.

    Identical values to frame_signal(x, ...)[..., t0:t0+n_frames, :] but only
    touches (and transforms) the needed samples — the model only consumes
    STFT frames [enc_ss, enc_tt), ~36% fewer than the full framing.
    """
    import jax.numpy as jnp

    hop = wind_size // n_overlap
    batch = x.shape[:-1]
    n_pad = -(-n_frames // n_overlap) * n_overlap  # frames rounded up
    last_start = (t0 + n_pad - 1) * hop
    need = last_start + wind_size
    if need > x.shape[-1]:
        pad = [(0, 0)] * (x.ndim - 1) + [(0, need - x.shape[-1])]
        x = jnp.pad(x, pad)
    n_winds = n_pad // n_overlap
    streams = [
        x[..., (t0 + k) * hop: (t0 + k) * hop + wind_size * n_winds]
        .reshape(*batch, n_winds, 1, wind_size)
        for k in range(n_overlap)
    ]
    frames = jnp.concatenate(streams, axis=-2).reshape(*batch, n_pad, wind_size)
    return frames[..., :n_frames, :]


def stft_real(x, wind_size: int, n_overlap: int, dtype=None, precision="highest",
              frame_start: int | None = None, n_frames: int | None = None,
              half: bool = False):
    """Real-arithmetic STFT: (..., N) -> (Re, Im) each (..., n_frames, wind).

    precision: jax matmul precision for the DFT matmuls. 'highest' is
    fp32-exact (~1e-5 vs FFT, ~36x slower than raw bf16 MXU passes but still
    ~2ms for a batch-8 full pipeline); 'default' uses single-pass bf16
    (~8e-2 relative error on small bins) for throughput-bound training.
    frame_start/n_frames restrict computation to a frame range.
    half=True computes only the wind/2+1 non-redundant bins of the real
    input (the rest are conjugate mirrors) — half the analysis matmul.
    """
    import jax.numpy as jnp

    assert (n_frames is None) or (frame_start is not None), (
        "n_frames requires frame_start (pass frame_start=0 for a prefix)")
    if frame_start is not None:
        frames = frame_signal_range(x, wind_size, n_overlap, frame_start, n_frames)
    else:
        frames = frame_signal(x, wind_size, n_overlap)
    win = jnp.asarray(hann_window(wind_size), dtype=frames.dtype)
    frames = frames * win
    c, s = _basis(wind_size)
    if half:
        c, s = c[:, : wind_size // 2 + 1], s[:, : wind_size // 2 + 1]
    c = jnp.asarray(c)
    sn = jnp.asarray(s)
    if dtype is not None:
        frames, c, sn = frames.astype(dtype), c.astype(dtype), sn.astype(dtype)
    re = jnp.matmul(frames, c, precision=precision, preferred_element_type=jnp.float32)
    im = jnp.matmul(frames, sn, precision=precision, preferred_element_type=jnp.float32)
    return re, im


def mirror_hermitian_magnitude(mag_h):
    """(..., n/2+1) magnitudes of a real signal -> full (..., n) via symmetry."""
    import jax.numpy as jnp

    return jnp.concatenate([mag_h, mag_h[..., -2:0:-1]], axis=-1)


def stft_magnitude(x, wind_size: int, n_overlap: int, dtype=None, precision="highest"):
    """|STFT|: (..., N) -> (..., n_frames, wind)."""
    import jax.numpy as jnp

    re, im = stft_real(x, wind_size, n_overlap, dtype=dtype, precision=precision)
    return jnp.sqrt(re * re + im * im)


def istft_real(re, im, n_overlap: int, precision="highest"):
    """Inverse of stft_real under the comb-stream overlap-add (see dsp.stft.istft).

    (..., n_frames, n_freqs) real pairs -> (..., out_len) real.
    """
    import jax.numpy as jnp

    *batch, n_frames, n_freqs = re.shape
    c, s = _basis(n_freqs)
    c = jnp.asarray(c)
    sn = jnp.asarray(s)
    # real(ifft(X)) = (Re @ C + Im @ S) / N
    x = (jnp.matmul(re, c, precision=precision, preferred_element_type=jnp.float32)
         + jnp.matmul(im, sn, precision=precision, preferred_element_type=jnp.float32)) / float(n_freqs)
    return _overlap_add(x, n_overlap)


def _overlap_add(x, n_overlap: int):
    """Comb-stream overlap-add of per-frame ifft outputs (..., T, F) -> (..., L)."""
    import jax.numpy as jnp

    *batch, n_frames, n_freqs = x.shape
    hop = n_freqs // n_overlap
    n_winds = n_frames // n_overlap
    x = x[..., : n_winds * n_overlap, :].reshape(*batch, n_winds, n_overlap, n_freqs)
    x = jnp.swapaxes(x, -2, -3).reshape(*batch, n_overlap, n_winds * n_freqs)
    out_len = n_winds * n_freqs - (n_overlap - 1) * hop
    acc = 0.0
    for k in range(n_overlap):
        start = (n_overlap - 1 - k) * hop
        acc = acc + x[..., k, start: start + out_len]
    return acc / float(n_overlap)


def stft_for_loss_real(signal, window: int, n_overlap: int, precision="highest"):
    """Real-arithmetic version of dsp.stft.stft_for_loss (loss-side STFT).

    (B, N, C) -> (Re, Im) each (B, C, n_frames, window_pow2). The pow2
    rounding and py2-faithful framing live in dsp.stft.loss_frame_windows,
    shared with the FFT reference path.
    """
    import jax.numpy as jnp

    from spatialaudiogen_tpu.dsp.stft import hann_window as _hann
    from spatialaudiogen_tpu.dsp.stft import loss_frame_windows

    windows, window = loss_frame_windows(signal, window, n_overlap)
    win = jnp.asarray(_hann(window), dtype=signal.dtype)
    windows = windows * win
    c, s = _basis(window)
    re = jnp.matmul(windows, jnp.asarray(c), precision=precision,
                    preferred_element_type=jnp.float32)
    im = jnp.matmul(windows, jnp.asarray(s), precision=precision,
                    preferred_element_type=jnp.float32)
    return re, im


def istft_from_masked(re, im, mask, n_overlap: int, precision="highest"):
    """Fused (real) masked ISTFT: mask broadcasts against (..., T, F) spectra.

    Equivalent to reference model.py:334-341: sigmoid mask (already applied
    by caller or passed raw here) times complex STFT, then comb ISTFT.
    `mask` must be real; broadcasting rules apply (e.g. per-track masks with
    a leading track axis).
    """
    return istft_real(re * mask, im * mask, n_overlap, precision=precision)


@functools.lru_cache(maxsize=8)
def _half_basis(n: int):
    """Positive-angle bases over the non-redundant bins k = 0..n/2."""
    k = np.arange(n // 2 + 1)
    ang = 2.0 * np.pi * np.outer(k, np.arange(n)) / n
    return np.cos(ang).astype(np.float32), np.sin(ang).astype(np.float32)


def fold_hermitian_mask(mask):
    """Fold a real per-bin mask over Hermitian symmetry: (..., n) -> (..., n/2+1).

    For a real analysis signal, X[n-k] = conj(X[k]), and a real mask M gives
    real(ifft(M*X))_t = (1/n) sum_k M'_k (ReX_k cos(2pi k t/n)
                                          - ImX_k sin(2pi k t/n))
    with M'_0 = M_0, M'_{n/2} = M_{n/2}, M'_k = M_k + M_{n-k} otherwise —
    so the synthesis only ever sees the folded mask on n/2+1 bins. Exact.
    """
    import jax.numpy as jnp

    n = mask.shape[-1]
    h = n // 2
    mid = mask[..., 1:h] + mask[..., :h:-1]
    return jnp.concatenate([mask[..., :1], mid, mask[..., h:h + 1]], axis=-1)


def istft_from_masked_hermitian(re_h, im_h, mask, n_overlap: int,
                                n_freqs: int, precision="highest"):
    """Masked comb ISTFT using only the n/2+1 non-redundant bins.

    re_h/im_h: (..., T, n/2+1) spectra of a REAL analysis signal (the first
    n/2+1 columns of stft_real's output); mask: real (..., T, n) full-bin
    mask (e.g. the learned separation mask). Numerically identical to
    istft_from_masked on the full spectrum, at half the synthesis matmul
    cost — the dominant FLOPs of the separation head.
    """
    import jax.numpy as jnp

    m = fold_hermitian_mask(mask)
    c2, s2 = _half_basis(n_freqs)
    x = (jnp.matmul(re_h * m, jnp.asarray(c2), precision=precision,
                    preferred_element_type=jnp.float32)
         - jnp.matmul(im_h * m, jnp.asarray(s2), precision=precision,
                      preferred_element_type=jnp.float32)) / float(n_freqs)
    return _overlap_add(x, n_overlap)
