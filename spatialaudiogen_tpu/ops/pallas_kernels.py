"""Pallas TPU kernels for the separation head's hot path.

`masked_istft_pallas` fuses the whole masked synthesis of one (batch, track)
tile in VMEM: sigmoid-masked spectrum scaling, the two iDFT matmuls against
VMEM-resident cos/sin bases, and the comb-stream overlap-add — so the masked
re/im intermediates (hundreds of MB per step at batch 32 x 32 tracks) never
round-trip through HBM. Grid is (batch*, tracks); the DFT bases use constant
index maps so the pipeline keeps them resident across grid steps.

Numerics match ops.dft.istft_real within float32 matmul tolerance. The
custom VJP is a second fused kernel with the same grid structure: it
scatters the output cotangent back onto the comb streams, reuses the
(symmetric) cos/sin bases for the transposed matmuls, and accumulates the
d(re)/d(im) partial sums across track tiles by revisiting the output block,
so training's hot op stays in VMEM end to end. `_bwd_xla` keeps the plain
XLA formulation for verification.

Pallas interpret mode is used in CPU tests; the model falls back to the XLA
formulation automatically off-TPU (models.sptaudiogen._pallas_enabled).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from spatialaudiogen_tpu.ops.dft import _basis, istft_real


TRACK_TILE = 8  # tracks per grid step (>=8 keeps block tiling MXU-legal)


def _to_precision(precision):
    """Map the model's dft_precision string onto what Mosaic supports
    (DEFAULT = one bf16 MXU pass ~2.5e-3 rel err; HIGHEST = six passes,
    ~f64-grade — Precision.HIGH is not implemented in the Pallas lowering)."""
    if precision in ("highest", jax.lax.Precision.HIGHEST):
        return jax.lax.Precision.HIGHEST
    return None


def _kernel(re_ref, im_ref, mask_ref, c_ref, s_ref, out_ref, *, n_overlap: int,
            precision):
    tr, n_frames, n_freqs = mask_ref.shape[1:]
    hop = n_freqs // n_overlap
    n_winds = n_frames // n_overlap
    out_len = n_winds * n_freqs - (n_overlap - 1) * hop

    m = mask_ref[0]                                     # (TR, T, F)
    rm = (re_ref[0][None] * m).reshape(tr * n_frames, n_freqs)
    imm = (im_ref[0][None] * m).reshape(tr * n_frames, n_freqs)
    x = (jnp.dot(rm, c_ref[...], preferred_element_type=jnp.float32,
                 precision=precision)
         + jnp.dot(imm, s_ref[...], preferred_element_type=jnp.float32,
                   precision=precision)) / n_freqs
    # comb-stream overlap-add (see dsp.stft.istft): stream k = frames
    # t % n_overlap == k butt-joined, trimmed to a common interior.
    x = x.reshape(tr, n_winds, n_overlap, n_freqs)
    acc = jnp.zeros((tr, out_len), jnp.float32)
    for k in range(n_overlap):
        stream = x[:, :, k, :].reshape(tr, n_winds * n_freqs)
        start = (n_overlap - 1 - k) * hop
        acc = acc + stream[:, start: start + out_len]
    out_ref[0] = acc / float(n_overlap)


def masked_istft_pallas(re, im, mask, n_overlap: int = 4, interpret: bool = False,
                        precision="highest"):
    """Fused masked comb-ISTFT.

    re, im: (B, n_in, T, F) real/imag spectra; mask: (B, n_in, TR, T, F).
    Returns (B, n_in, TR, out_len) separated track waveforms.
    `precision` applies to the iDFT matmuls (see _to_precision).

    Trailing frames beyond a multiple of n_overlap are dropped, exactly as
    ops.dft.istft_real does (their gradient is zero via the slice); the
    kernel itself requires divisible T.
    """
    t = re.shape[2]
    t_use = (t // n_overlap) * n_overlap
    if t_use != t:
        re, im, mask = (re[:, :, :t_use], im[:, :, :t_use],
                        mask[:, :, :, :t_use])
    return _masked_istft_pallas_vjp(re, im, mask, n_overlap, interpret,
                                    precision)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def _masked_istft_pallas_vjp(re, im, mask, n_overlap: int = 4,
                             interpret: bool = False, precision="highest"):
    return _forward(re, im, mask, n_overlap, interpret, precision)


def _forward(re, im, mask, n_overlap, interpret, precision="highest"):
    b, n_in, t, f = re.shape
    tracks = mask.shape[2]
    hop = f // n_overlap
    n_winds = t // n_overlap
    out_len = n_winds * f - (n_overlap - 1) * hop
    tile = min(TRACK_TILE, tracks)
    pad = (-tracks) % tile
    if pad:
        mask = jnp.concatenate(
            [mask, jnp.zeros(mask.shape[:2] + (pad,) + mask.shape[3:], mask.dtype)],
            axis=2)
    tracks_p = tracks + pad

    re2 = re.reshape(b * n_in, t, f)
    im2 = im.reshape(b * n_in, t, f)
    mask2 = mask.reshape(b * n_in, tracks_p, t, f)
    c, s = _basis(f)

    grid = (b * n_in, tracks_p // tile)
    out = pl.pallas_call(
        functools.partial(_kernel, n_overlap=n_overlap,
                          precision=_to_precision(precision)),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, t, f), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, t, f), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile, t, f), lambda i, j: (i, j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((f, f), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((f, f), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, tile, out_len), lambda i, j: (i, j, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b * n_in, tracks_p, out_len), jnp.float32),
        interpret=interpret,
    )(re2, im2, mask2, jnp.asarray(c), jnp.asarray(s))
    return out.reshape(b, n_in, tracks_p, out_len)[:, :, :tracks]


def _bwd_kernel(g_ref, re_ref, im_ref, mask_ref, c_ref, s_ref,
                gmask_ref, gre_ref, gim_ref, *, n_overlap: int, n_freqs: int,
                precision):
    """Fused backward for one (batch, track-tile, freq-chunk) block.

    Scatters the output cotangent back onto the comb streams, runs the two
    transposed iDFT matmuls (the cos/sin bases are symmetric, so C^T = C),
    and emits d(mask) for this tile plus partial d(re)/d(im) accumulated
    across track tiles (the j grid axis revisits the same output block).

    The innermost grid axis chunks the *output frequency* columns: the
    contraction runs over all n_freqs frame samples, but only an
    (n_freqs, FB) basis slab and FB-wide re/im/mask/output blocks are VMEM
    resident. With full (1024, 1024) bases the block set needed ~16.1 MB of
    scoped VMEM — right at the 16 MB stack limit and over it under some
    surrounding fusions (observed with bf16 encoders).
    """
    tr, n_frames, fb = mask_ref.shape[1:]
    hop = n_freqs // n_overlap
    n_winds = n_frames // n_overlap
    out_len = n_winds * n_freqs - (n_overlap - 1) * hop
    scale = 1.0 / (n_overlap * n_freqs)

    g = g_ref[0] * scale                                # (TR, out_len)
    max_front = (n_overlap - 1) * hop
    gp = jnp.pad(g, ((0, 0), (max_front, max_front)))
    streams = []
    for k in range(n_overlap):
        front = (n_overlap - 1 - k) * hop
        gk = gp[:, max_front - front: max_front - front + n_winds * n_freqs]
        streams.append(gk.reshape(tr, n_winds, 1, n_freqs))
    gx = jnp.concatenate(streams, axis=2)               # (TR, nW, OV, F)
    gx = gx.reshape(tr * n_frames, n_freqs)

    g_rm = jnp.dot(gx, c_ref[...], preferred_element_type=jnp.float32,
                   precision=precision)
    g_imm = jnp.dot(gx, s_ref[...], preferred_element_type=jnp.float32,
                    precision=precision)
    g_rm = g_rm.reshape(tr, n_frames, fb)
    g_imm = g_imm.reshape(tr, n_frames, fb)

    re = re_ref[0][None]
    im = im_ref[0][None]
    m = mask_ref[0]
    # mask (and so its cotangent) may be bf16 in the fast mode; the product
    # is accumulated in f32 and cast on store
    gmask_ref[0] = (g_rm * re + g_imm * im).astype(gmask_ref.dtype)
    part_re = jnp.sum(g_rm * m, axis=0)
    part_im = jnp.sum(g_imm * m, axis=0)

    @pl.when(pl.program_id(2) == 0)
    def _init():
        gre_ref[0] = part_re
        gim_ref[0] = part_im

    @pl.when(pl.program_id(2) != 0)
    def _acc():
        gre_ref[0] = gre_ref[0] + part_re
        gim_ref[0] = gim_ref[0] + part_im


def _backward_pallas(re, im, mask, g, n_overlap, interpret, precision="highest"):
    b, n_in, t, f = re.shape
    tracks = mask.shape[2]
    tile = min(TRACK_TILE, tracks)
    pad = (-tracks) % tile
    if pad:
        mask = jnp.concatenate(
            [mask, jnp.zeros(mask.shape[:2] + (pad,) + mask.shape[3:], mask.dtype)],
            axis=2)
        g = jnp.concatenate(
            [g, jnp.zeros(g.shape[:2] + (pad,) + g.shape[3:], g.dtype)], axis=2)
    tracks_p = tracks + pad
    out_len = g.shape[-1]

    re2 = re.reshape(b * n_in, t, f)
    im2 = im.reshape(b * n_in, t, f)
    mask2 = mask.reshape(b * n_in, tracks_p, t, f)
    g2 = g.reshape(b * n_in, tracks_p, out_len)
    c, s = _basis(f)

    fb = min(512, f)  # output-frequency chunk (see _bwd_kernel docstring)
    assert f % fb == 0
    # grid order: the track-tile axis j accumulates into the gre/gim blocks
    # by revisiting them, so it must be INNERMOST (revisits of an output
    # block are only defined for consecutive grid steps); the freq-chunk
    # axis k sits in the middle.
    gmask, gre, gim = pl.pallas_call(
        functools.partial(_bwd_kernel, n_overlap=n_overlap, n_freqs=f,
                          precision=_to_precision(precision)),
        grid=(b * n_in, f // fb, tracks_p // tile),
        in_specs=[
            pl.BlockSpec((1, tile, out_len), lambda i, k, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, t, fb), lambda i, k, j: (i, 0, k),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, t, fb), lambda i, k, j: (i, 0, k),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile, t, fb), lambda i, k, j: (i, j, 0, k),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((f, fb), lambda i, k, j: (0, k), memory_space=pltpu.VMEM),
            pl.BlockSpec((f, fb), lambda i, k, j: (0, k), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, tile, t, fb), lambda i, k, j: (i, j, 0, k),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, t, fb), lambda i, k, j: (i, 0, k),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, t, fb), lambda i, k, j: (i, 0, k),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((b * n_in, tracks_p, t, f), mask.dtype),
            jax.ShapeDtypeStruct((b * n_in, t, f), jnp.float32),
            jax.ShapeDtypeStruct((b * n_in, t, f), jnp.float32),
        ),
        interpret=interpret,
    )(g2, re2, im2, mask2, jnp.asarray(c), jnp.asarray(s))
    g_mask = gmask.reshape(b, n_in, tracks_p, t, f)[:, :, :tracks]
    return gre.reshape(b, n_in, t, f), gim.reshape(b, n_in, t, f), g_mask


def _fwd(re, im, mask, n_overlap, interpret, precision="highest"):
    return _forward(re, im, mask, n_overlap, interpret, precision), (re, im, mask)


def _bwd(n_overlap, interpret, precision, residuals, g):
    """Backward: fused Pallas path (same grid structure as the forward)."""
    re, im, mask = residuals
    g_re, g_im, g_mask = _backward_pallas(re, im, mask, g, n_overlap, interpret,
                                          precision)
    return g_re, g_im, g_mask


def _bwd_xla(n_overlap, residuals, g):
    """Reference backward via the XLA formulation (kept for verification)."""
    re, im, mask = residuals
    f = re.shape[-1]
    c, s = _basis(f)
    c = jnp.asarray(c)
    s = jnp.asarray(s)
    hop = f // n_overlap

    # d/dy of overlap-add: scatter g back onto the comb streams.
    b, n_in, tracks, out_len = g.shape
    t = re.shape[2]
    n_winds = t // n_overlap
    gx = jnp.zeros((b, n_in, tracks, n_winds, n_overlap, f), jnp.float32)
    for k in range(n_overlap):
        start = (n_overlap - 1 - k) * hop
        stream = jnp.zeros((b, n_in, tracks, n_winds * f), jnp.float32)
        stream = jax.lax.dynamic_update_slice(
            stream, g / float(n_overlap), (0, 0, 0, start))
        gx = gx.at[..., k, :].set(stream.reshape(b, n_in, tracks, n_winds, f))
    gx = gx.reshape(b, n_in, tracks, t, f) / f          # (dL/d x_frames)/N

    # x = (re*m) @ C + (im*m) @ S  (per track)
    g_rm = jnp.matmul(gx, c.T, precision="highest")      # dL/d(re*m)
    g_im = jnp.matmul(gx, s.T, precision="highest")      # dL/d(im*m)
    g_mask = (g_rm * re[:, :, None] + g_im * im[:, :, None]).astype(mask.dtype)
    g_re = jnp.sum(g_rm * mask, axis=2)
    g_im_out = jnp.sum(g_im * mask, axis=2)
    return g_re, g_im_out, g_mask


_masked_istft_pallas_vjp.defvjp(_fwd, _bwd)


def masked_istft_reference(re, im, mask, n_overlap: int = 4):
    """XLA reference for the kernel (same signature/output)."""
    return istft_real(re[:, :, None] * mask, im[:, :, None] * mask, n_overlap,
                      precision="highest")


# ---------------------------------------------------------------------------
# NHWC-mask variant: consumes the separation mask in the deconv's native
# (B, T, F, C) layout, so the model's frame-crop + NHWC->track-major layout
# copy (5.3 ms of the 29.8 ms batch-128 forward, PERF.md) never materializes.
# The transpose happens in-kernel on VMEM-resident blocks instead; the iDFT
# contraction is chunked over the frequency axis (grid axis k revisits the
# output block), so only (FB, F) basis slabs and (T, FB, C) mask blocks are
# resident.
#
# MEASURED RESULT (v5e, batch 128, f32): 23.4 ms vs 7.8 ms for the XLA
# chain + track-major kernel — the in-kernel (T*FB, C) lane<->sublane
# transposes cost ~2x the whole HBM relayout they replace, and K=128
# f-chunked matmuls fragment MXU passes. Default OFF
# (SptAudioGenConfig.pallas_nhwc); kept correct + tested for hardware where
# the XLA copy, not the transpose unit, is the bottleneck.
# ---------------------------------------------------------------------------


def _nhwc_kernel(re_ref, im_ref, mask_ref, c_ref, s_ref, out_ref, *,
                 n_overlap: int, n_freqs: int, precision):
    t, fb, ch = mask_ref.shape[1:]
    k = pl.program_id(1)

    m = mask_ref[0]                                     # (T, FB, C)
    em_re = m * re_ref[0][:, :, None]
    em_im = m * im_ref[0][:, :, None]
    # track-major rows via one 2D lane<->sublane transpose:
    # (T*FB, C) -> (C, T*FB) -> (C*T, FB)
    rm = em_re.reshape(t * fb, ch).T.reshape(ch * t, fb)
    imm = em_im.reshape(t * fb, ch).T.reshape(ch * t, fb)
    part = (jnp.dot(rm, c_ref[...], preferred_element_type=jnp.float32,
                    precision=precision)
            + jnp.dot(imm, s_ref[...], preferred_element_type=jnp.float32,
                      precision=precision)) / n_freqs

    # Overlap-add is linear, so each freq-chunk's partial synthesis is
    # comb-summed immediately and accumulated into the revisited output
    # block — no (C*T, F) accumulator lives in VMEM (that put the block
    # set 432K over the 16M scoped-vmem stack limit at batch 128).
    hop = n_freqs // n_overlap
    n_winds = t // n_overlap
    out_len = n_winds * n_freqs - (n_overlap - 1) * hop
    x = part.reshape(ch, n_winds, n_overlap, n_freqs)
    acc = jnp.zeros((ch, out_len), jnp.float32)
    for j in range(n_overlap):
        stream = x[:, :, j, :].reshape(ch, n_winds * n_freqs)
        start = (n_overlap - 1 - j) * hop
        acc = acc + stream[:, start: start + out_len]
    acc = acc / float(n_overlap)

    @pl.when(k == 0)
    def _init():
        out_ref[0] = acc

    @pl.when(k != 0)
    def _acc():
        out_ref[0] = out_ref[0] + acc


def _nhwc_forward(re, im, mask_nhwc, n_overlap, interpret, precision="highest"):
    b, t, f = re.shape
    ch = mask_nhwc.shape[-1]
    pad = (-ch) % 8                                     # sublane-legal output
    if pad:
        mask_nhwc = jnp.concatenate(
            [mask_nhwc,
         jnp.zeros(mask_nhwc.shape[:-1] + (pad,), mask_nhwc.dtype)], axis=-1)
    ch_p = ch + pad
    hop = f // n_overlap
    n_winds = t // n_overlap
    out_len = n_winds * f - (n_overlap - 1) * hop
    c, s = _basis(f)
    fb = min(128, f)  # lane-dim blocks must be 128-divisible (Mosaic rule)
    assert f % fb == 0

    out = pl.pallas_call(
        functools.partial(_nhwc_kernel, n_overlap=n_overlap, n_freqs=f,
                          precision=_to_precision(precision)),
        grid=(b, f // fb),
        in_specs=[
            pl.BlockSpec((1, t, fb), lambda i, k: (i, 0, k),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, t, fb), lambda i, k: (i, 0, k),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, t, fb, ch_p), lambda i, k: (i, 0, k, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((fb, f), lambda i, k: (k, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((fb, f), lambda i, k: (k, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, ch_p, out_len), lambda i, k: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, ch_p, out_len), jnp.float32),
        interpret=interpret,
    )(re, im, mask_nhwc, jnp.asarray(c), jnp.asarray(s))
    return out[:, :ch]


def masked_istft_nhwc_pallas(re, im, mask_nhwc, n_overlap: int = 4,
                             interpret: bool = False, precision="highest"):
    """Fused masked comb-ISTFT over an NHWC (deconv-native) mask.

    re, im: (B, T, F) real/imag spectra of the single input channel;
    mask_nhwc: (B, T, F, C) sigmoid mask, C = tracks. Returns
    (B, C, out_len) separated track waveforms — numerically identical to
    masked_istft_pallas on the transposed mask, without the layout copy.
    Trailing frames beyond a multiple of n_overlap are dropped like
    ops.dft.istft_real.
    """
    t = re.shape[1]
    t_use = (t // n_overlap) * n_overlap
    if t_use != t:
        re, im, mask_nhwc = re[:, :t_use], im[:, :t_use], mask_nhwc[:, :t_use]
    return _masked_istft_nhwc_vjp(re, im, mask_nhwc, n_overlap, interpret,
                                  precision)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def _masked_istft_nhwc_vjp(re, im, mask_nhwc, n_overlap: int = 4,
                           interpret: bool = False, precision="highest"):
    return _nhwc_forward(re, im, mask_nhwc, n_overlap, interpret, precision)


def _nhwc_fwd(re, im, mask_nhwc, n_overlap, interpret, precision="highest"):
    return (_nhwc_forward(re, im, mask_nhwc, n_overlap, interpret, precision),
            (re, im, mask_nhwc))


def _nhwc_bwd(n_overlap, interpret, precision, residuals, g):
    """Backward via the track-major fused kernel: transposing the mask and
    its cotangent here re-introduces layout copies in *training* only — the
    forward-only deploy path keeps the full win. (A native-NHWC backward
    kernel needs either double VMEM for gx or a recompute; deferred.)"""
    re, im, mask_nhwc = residuals
    mask_tm = mask_nhwc.transpose(0, 3, 1, 2)[:, None]  # (B, 1, C, T, F)
    g_re, g_im, g_mask = _backward_pallas(
        re[:, None], im[:, None], mask_tm, g[:, None], n_overlap, interpret,
        precision)
    return (g_re[:, 0], g_im[:, 0],
            g_mask[:, 0].transpose(0, 2, 3, 1).astype(mask_nhwc.dtype))


_masked_istft_nhwc_vjp.defvjp(_nhwc_fwd, _nhwc_bwd)
