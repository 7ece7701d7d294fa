"""STFT / ISTFT with the reference model's exact framing semantics.

The reference's TF1 `stft` (myutils.py:119-147) stacks `n_overlap` shifted
non-overlapping framings and interleaves them; algebraically that is a plain
hop = wind/n_overlap STFT whose frame count is truncated to
n_overlap * (floor(N/wind) - 1) frames (frame t covers samples
[t*hop, t*hop + wind)). We implement that directly with shifted strided
reshapes — pure slice/reshape ops that XLA fuses — followed by one batched FFT.

`istft` (myutils.py:181-211) likewise reduces to: ifft each frame, split the
frame sequence into n_overlap comb streams (t % n_overlap == k), butt-join
each stream, trim so all streams align on sample window*(n_overlap-1)/n_overlap
onward, and average the streams (divide by n_overlap — NOT by the window
overlap sum, so a unit mask reproduces the input scaled by
sum(hann)/n_overlap = 0.5 for n_overlap=4; checkpoint weights bake this in).

`stft_for_loss` (myutils.py:151-178) is the loss-side variant: window rounded
UP to the next power of two, overlap streams concatenated frame-major per
stream (ordering irrelevant to the mean-reduced loss but kept identical).

All functions take jnp or numpy arrays and are jit-safe (static shapes only).
"""

from __future__ import annotations

import numpy as np


def hann_window(wind_size: int) -> np.ndarray:
    """Periodic Hann window, matching myutils.py:134."""
    return 0.5 - 0.5 * np.cos(2 * np.pi / wind_size * np.arange(wind_size))


def frame_count(n_samples: int, wind_size: int, n_overlap: int) -> int:
    return n_overlap * (n_samples // wind_size - 1)


def frame_signal(x, wind_size: int, n_overlap: int):
    """(..., N) -> (..., n_frames, wind_size); frame t starts at t*hop."""
    import jax.numpy as jnp

    hop = wind_size // n_overlap
    n = x.shape[-1]
    n_winds = n // wind_size - 1
    batch = x.shape[:-1]
    streams = [
        x[..., k * hop: k * hop + wind_size * n_winds].reshape(*batch, n_winds, 1, wind_size)
        for k in range(n_overlap)
    ]
    frames = jnp.concatenate(streams, axis=-2)  # (..., n_winds, n_overlap, wind)
    return frames.reshape(*batch, n_winds * n_overlap, wind_size)


def stft(x, wind_size: int, n_overlap: int):
    """Complex STFT: (..., N) -> (..., n_frames, wind_size) complex64.

    Full complex FFT over all wind_size bins (not rfft) — the learned
    separation mask covers all bins (reference myutils.py:138).
    """
    import jax.numpy as jnp

    frames = frame_signal(x, wind_size, n_overlap)
    win = jnp.asarray(hann_window(wind_size), dtype=frames.dtype)
    return jnp.fft.fft(frames * win, axis=-1)


def istft(spec, n_overlap: int):
    """Inverse of `stft` under the reference's comb-stream overlap-add.

    (..., n_frames, n_freqs) complex -> (..., out_len) real where
    out_len = (n_frames // n_overlap) * n_freqs - (n_overlap - 1) * hop.
    Output sample s corresponds to signal sample s + (n_overlap-1)*hop of the
    original framing.
    """
    import jax.numpy as jnp

    *batch, n_frames, n_freqs = spec.shape
    hop = n_freqs // n_overlap
    n_winds = n_frames // n_overlap
    spec = spec[..., : n_winds * n_overlap, :]
    x = jnp.fft.ifft(spec, axis=-1).real                       # (..., T, F)
    x = x.reshape(*batch, n_winds, n_overlap, n_freqs)
    # stream k = frames with t % n_overlap == k, butt-joined
    streams = x.transpose(*range(len(batch)), -2, -3, -1)      # (..., n_overlap, nW, F)
    streams = streams.reshape(*batch, n_overlap, n_winds * n_freqs)
    total = n_winds * n_freqs
    out_len = total - (n_overlap - 1) * hop
    acc = 0.0
    for k in range(n_overlap):
        start = (n_overlap - 1 - k) * hop
        acc = acc + streams[..., k, start: start + out_len]
    return acc / float(n_overlap)


def loss_frame_windows(signal, window: int, n_overlap: int):
    """Shared loss-side framing: (B, N, C) -> ((B, C, nW, window_pow2)
    windows, window_pow2).

    Window is rounded UP to the next power of two (myutils.py:155); the
    overlap streams are concatenated stream-major, each stream's frame
    count using the reference's py2-faithful `(n - i*stride - 1) / window`
    truncation. Single source for both the FFT reference (stft_for_loss)
    and the device matmul path (ops.dft.stft_for_loss_real).
    """
    import jax.numpy as jnp

    bs, n, nc = signal.shape
    window = int(2 ** np.ceil(np.log(window) / np.log(2)))

    if n_overlap == 1:
        n_w = int(float(n) / window)
        if n_w > 1:
            sig = signal[:, : window * n_w, :] if n > window * n_w else signal
            windows = sig.reshape(bs, n_w, window, nc)
        else:
            windows = signal[:, None]
    else:
        stride = int(window / n_overlap)
        parts = []
        for i in range(n_overlap):
            n_w = int(float(n - i * stride - 1) / window)
            y = signal[:, i * stride: i * stride + window * n_w, :]
            parts.append(y.reshape(bs, n_w, window, nc))
        windows = jnp.concatenate(parts, axis=1)

    return windows.transpose(0, 3, 1, 2), window               # (B, C, nW, window)


def stft_for_loss(signal, window: int, n_overlap: int):
    """Loss-side STFT: (B, N, C) -> (B, C, n_frames, window_pow2) complex
    (myutils.py:151-178 semantics)."""
    import jax.numpy as jnp

    windows, window = loss_frame_windows(signal, window, n_overlap)
    win = jnp.asarray(hann_window(window), dtype=signal.dtype)
    return jnp.fft.fft(windows * win, axis=-1)


