"""Pallas fused masked-ISTFT kernel vs the XLA reference (interpret mode)."""

import jax
import jax.numpy as jnp
import numpy as np

from spatialaudiogen_tpu.ops.dft import stft_real
from spatialaudiogen_tpu.ops.pallas_kernels import (
    masked_istft_nhwc_pallas,
    masked_istft_pallas,
    masked_istft_reference,
)


def _inputs(b=2, n_in=1, tracks=3, wind=256, seed=0):
    rng = np.random.RandomState(seed)
    x = rng.randn(b, n_in, 9 * wind).astype(np.float32)
    re, im = stft_real(x, wind, 4)
    t = re.shape[2]
    mask = 1 / (1 + np.exp(-rng.randn(b, n_in, tracks, t, wind).astype(np.float32)))
    return jnp.asarray(re), jnp.asarray(im), jnp.asarray(mask)


def test_kernel_matches_reference():
    re, im, mask = _inputs()
    ref = np.asarray(masked_istft_reference(re, im, mask, 4))
    got = np.asarray(masked_istft_pallas(re, im, mask, 4, True))
    assert got.shape == ref.shape
    np.testing.assert_allclose(got, ref, atol=2e-4, rtol=1e-4)


def test_kernel_gradients_match_reference():
    re, im, mask = _inputs(b=1, tracks=2, wind=128, seed=1)

    def loss_k(r, i, m):
        return jnp.sum(masked_istft_pallas(r, i, m, 4, True) ** 2)

    def loss_r(r, i, m):
        return jnp.sum(masked_istft_reference(r, i, m, 4) ** 2)

    gk = jax.grad(loss_k, argnums=(0, 1, 2))(re, im, mask)
    gr = jax.grad(loss_r, argnums=(0, 1, 2))(re, im, mask)
    for a, b_ in zip(gk, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_), atol=5e-3,
                                   rtol=1e-3)


def test_nhwc_kernel_matches_reference():
    """The NHWC-mask kernel (in-kernel transpose, f-chunked accumulation)
    must match the track-major kernel/reference bit-for-tolerance."""
    re, im, mask = _inputs(tracks=12, wind=256)
    ref = np.asarray(masked_istft_reference(re, im, mask, 4))[:, 0]
    mask_nhwc = jnp.asarray(mask)[:, 0].transpose(0, 2, 3, 1)  # (B, T, F, C)
    got = np.asarray(masked_istft_nhwc_pallas(re[:, 0], im[:, 0], mask_nhwc,
                                              4, True))
    assert got.shape == ref.shape
    np.testing.assert_allclose(got, ref, atol=2e-4, rtol=1e-4)


def test_nhwc_kernel_gradients_match_reference():
    re, im, mask = _inputs(b=1, tracks=2, wind=128, seed=1)
    mask_nhwc = mask[:, 0].transpose(0, 2, 3, 1)

    def loss_k(r, i, m):
        return jnp.sum(masked_istft_nhwc_pallas(r, i, m, 4, True) ** 2)

    def loss_r(r, i, m):
        return jnp.sum(
            masked_istft_reference(r[:, None], i[:, None],
                                   m.transpose(0, 3, 1, 2)[:, None], 4) ** 2)

    gk = jax.grad(loss_k, argnums=(0, 1, 2))(re[:, 0], im[:, 0], mask_nhwc)
    gr = jax.grad(loss_r, argnums=(0, 1, 2))(re[:, 0], im[:, 0], mask_nhwc)
    for a, b_ in zip(gk, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_), atol=5e-3,
                                   rtol=1e-3)


def test_nhwc_kernel_bf16_mask():
    re, im, mask = _inputs(b=1, tracks=2, wind=128, seed=2)
    mask16 = jnp.asarray(mask[:, 0].transpose(0, 2, 3, 1)).astype(jnp.bfloat16)
    out = masked_istft_nhwc_pallas(re[:, 0], im[:, 0], mask16, 4, True)
    assert out.dtype == jnp.float32
    ref = np.asarray(masked_istft_reference(
        re, im, jnp.asarray(mask16.transpose(0, 3, 1, 2)[:, None],
                            jnp.float32), 4))[:, 0]
    np.testing.assert_allclose(np.asarray(out), ref, atol=2e-2, rtol=2e-2)
    g = jax.grad(lambda m: jnp.sum(
        masked_istft_nhwc_pallas(re[:, 0], im[:, 0], m, 4, True) ** 2))(mask16)
    assert g.dtype == jnp.bfloat16


def test_kernel_bf16_mask_forward_and_gradients():
    """The bf16 fast mode stores the mask bf16: the kernel must accept it,
    return an f32 waveform, and emit a bf16 mask cotangent matching the XLA
    formulation (custom_vjp requires cotangent dtype == primal dtype)."""
    re, im, mask = _inputs(b=1, tracks=2, wind=128, seed=2)
    mask16 = mask.astype(jnp.bfloat16)

    out = masked_istft_pallas(re, im, mask16, 4, True)
    assert out.dtype == jnp.float32
    ref = np.asarray(masked_istft_reference(re, im, mask16.astype(jnp.float32), 4))
    np.testing.assert_allclose(np.asarray(out), ref, atol=2e-2, rtol=2e-2)

    def loss_k(r, i, m):
        return jnp.sum(masked_istft_pallas(r, i, m, 4, True) ** 2)

    def loss_r(r, i, m):
        return jnp.sum(masked_istft_reference(r, i, m.astype(jnp.float32), 4) ** 2)

    gk = jax.grad(loss_k, argnums=(0, 1, 2))(re, im, mask16)
    gr = jax.grad(loss_r, argnums=(0, 1, 2))(re, im, mask16)
    assert gk[2].dtype == jnp.bfloat16
    for a, b_ in zip(gk, gr):
        np.testing.assert_allclose(np.asarray(a, np.float32),
                                   np.asarray(b_, np.float32),
                                   atol=5e-2, rtol=5e-2)


def test_kernel_truncates_trailing_frames_like_istft_real():
    """T not divisible by n_overlap: the wrappers must drop trailing frames
    exactly as ops.dft.istft_real does (and zero their gradients) instead of
    crashing in the kernel reshape."""
    re, im, mask = _inputs(tracks=2, wind=128)
    re, im, mask = re[:, :, :-2], im[:, :, :-2], mask[:, :, :, :-2]  # T%4 != 0
    ref = np.asarray(masked_istft_reference(re, im, mask, 4))
    got = np.asarray(masked_istft_pallas(re, im, mask, 4, True))
    np.testing.assert_allclose(got, ref, atol=2e-4, rtol=1e-4)

    g = jax.grad(lambda m: jnp.sum(masked_istft_pallas(re, im, m, 4, True) ** 2))(mask)
    g_ref = jax.grad(lambda m: jnp.sum(masked_istft_reference(re, im, m, 4) ** 2))(mask)
    np.testing.assert_allclose(np.asarray(g), np.asarray(g_ref), atol=5e-3,
                               rtol=1e-3)
    # dropped frames carry zero gradient
    assert float(jnp.abs(g[..., -2:, :]).max()) == 0.0

    nh = np.asarray(masked_istft_nhwc_pallas(
        re[:, 0], im[:, 0], jnp.asarray(mask)[:, 0].transpose(0, 2, 3, 1), 4, True))
    np.testing.assert_allclose(nh, ref[:, 0], atol=2e-4, rtol=1e-4)


def test_bwd_xla_oracle_matches_fused_backward():
    """_bwd_xla is the plain-XLA backward kept for on-TPU kernel debugging;
    pin it against the fused Pallas backward so it cannot rot."""
    from spatialaudiogen_tpu.ops.pallas_kernels import (
        _backward_pallas,
        _bwd_xla,
    )

    re, im, mask = _inputs(b=2, tracks=12, wind=256, seed=3)  # multi-tile
    rng = np.random.RandomState(4)
    t = re.shape[2]
    out_len = (t // 4) * 256 - 3 * 64
    g = jnp.asarray(rng.randn(2, 1, 12, out_len).astype(np.float32))
    fused = _backward_pallas(re, im, mask, g, 4, True, "highest")
    oracle = _bwd_xla(4, (re, im, mask), g)
    for a, b_ in zip(fused, oracle):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_), atol=5e-4,
                                   rtol=1e-4)
