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


def stft_real(x, wind_size: int, n_overlap: int, dtype=None, precision="highest"):
    """Real-arithmetic STFT: (..., N) -> (Re, Im) each (..., n_frames, wind).

    precision: jax matmul precision for the DFT matmuls. 'highest' is
    fp32-exact (~1e-5 vs FFT, ~36x slower than raw bf16 MXU passes but still
    ~2ms for a batch-8 full pipeline); 'default' uses single-pass bf16
    (~8e-2 relative error on small bins) for throughput-bound training.
    """
    import jax.numpy as jnp

    frames = frame_signal(x, wind_size, n_overlap)
    win = jnp.asarray(hann_window(wind_size), dtype=frames.dtype)
    frames = frames * win
    c, s = _basis(wind_size)
    c = jnp.asarray(c)
    sn = jnp.asarray(s)
    if dtype is not None:
        frames, c, sn = frames.astype(dtype), c.astype(dtype), sn.astype(dtype)
    re = jnp.matmul(frames, c, precision=precision, preferred_element_type=jnp.float32)
    im = jnp.matmul(frames, sn, precision=precision, preferred_element_type=jnp.float32)
    return re, im


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


def istft_from_masked(re, im, mask, n_overlap: int, precision="highest"):
    """Fused (real) masked ISTFT: mask broadcasts against (..., T, F) spectra.

    Equivalent to reference model.py:334-341: sigmoid mask (already applied
    by caller or passed raw here) times complex STFT, then comb ISTFT.
    `mask` must be real; broadcasting rules apply (e.g. per-track masks with
    a leading track axis).
    """
    return istft_real(re * mask, im * mask, n_overlap, precision=precision)
