"""Thin Flax layer wrappers with the reference library's conventions.

Mirrors pyutils/tflib/wrappers/core.py semantics where they matter for
checkpoint parity:
  * Xavier/glorot-uniform kernel init, zero bias (core.py:34, core.py:14)
  * VALID transposed conv output size = in*stride + kernel - stride
    (core.py:137-140) — identical to flax ConvTranspose VALID
  * BatchNorm decay 0.99, epsilon 1e-3 (TF contrib defaults, core.py:210)
  * rank>2 dense inputs flattened to 2D and restored (core.py:76-91)
  * L2 weight decay 5e-4 on kernels, collected via `l2_regularization`
    (TF l2_regularizer halves the square sum; we match that factor).

Modules carry a `decay` switch so excluded layers (the localization output,
core usage at model.py:253-256) can opt out of weight decay by name tag.
"""

from __future__ import annotations

import functools
from typing import Callable, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
from flax.linen.initializers import glorot_uniform, truncated_normal, zeros_init
from jax import lax

class Dense(nn.Module):
    """fully_connected parity: matmul over the last axis, any input rank."""

    features: int
    use_bias: bool = True
    activation: Callable | None = None
    kernel_init: Callable = glorot_uniform()
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x):
        y = nn.Dense(self.features, use_bias=self.use_bias,
                     kernel_init=self.kernel_init, bias_init=zeros_init(),
                     dtype=self.dtype, name="dense")(x)
        return self.activation(y) if self.activation else y


def dense(x, features, name, activation=None, kernel_init=None, use_bias=True, dtype=None):
    init = kernel_init if kernel_init is not None else glorot_uniform()
    return Dense(features, use_bias=use_bias, activation=activation,
                 kernel_init=init, dtype=dtype, name=name)(x)


class BatchNorm(nn.Module):
    """BatchNorm with TF-contrib defaults and a no-update batch-stats mode.

    The reference runs its visual-encoder BN on batch statistics in BOTH
    train and eval mode (model.py:388 passes finetune=True unconditionally);
    flax's nn.BatchNorm cannot use batch stats without mutating the
    batch_stats collection. This module computes batch stats whenever
    use_running_average=False and only writes the running averages when the
    batch_stats collection is actually mutable (i.e. inside a train step).
    Parameter/collection layout matches nn.BatchNorm for converter compat.
    """

    use_running_average: bool = False
    momentum: float = 0.99
    epsilon: float = 1e-3
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x):
        feat = x.shape[-1]
        ra_mean = self.variable("batch_stats", "mean",
                                lambda: jnp.zeros((feat,), jnp.float32))
        ra_var = self.variable("batch_stats", "var",
                               lambda: jnp.ones((feat,), jnp.float32))
        scale = self.param("scale", nn.initializers.ones, (feat,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (feat,), jnp.float32)

        if self.use_running_average:
            mean, var = ra_mean.value, ra_var.value
        else:
            axes = tuple(range(x.ndim - 1))
            xf = x.astype(jnp.float32)
            mean = jnp.mean(xf, axis=axes)
            var = jnp.var(xf, axis=axes)
            if not self.is_initializing() and self.is_mutable_collection("batch_stats"):
                ra_mean.value = self.momentum * ra_mean.value + (1 - self.momentum) * mean
                ra_var.value = self.momentum * ra_var.value + (1 - self.momentum) * var

        y = (x.astype(jnp.float32) - mean) * jax_rsqrt(var + self.epsilon) * scale + bias
        return y.astype(x.dtype if self.dtype is None else self.dtype)


def jax_rsqrt(x):
    import jax

    return jax.lax.rsqrt(x)


class Conv2D(nn.Module):
    """conv_2d parity: NHWC VALID/SAME conv, optional BN (decay .99) else bias."""

    features: int
    kernel_size: Sequence[int]
    strides: Sequence[int] = (1, 1)
    padding: str = "VALID"
    use_bias: bool = True
    use_batch_norm: bool = False
    activation: Callable | None = None
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x, train: bool = True):
        y = nn.Conv(self.features, tuple(self.kernel_size), strides=tuple(self.strides),
                    padding=self.padding, use_bias=not self.use_batch_norm and self.use_bias,
                    kernel_init=glorot_uniform(), bias_init=zeros_init(),
                    dtype=self.dtype, name="conv")(x)
        if self.use_batch_norm:
            y = BatchNorm(use_running_average=not train, momentum=0.99,
                          epsilon=1e-3, dtype=self.dtype, name="bn")(y)
        return self.activation(y) if self.activation else y


def _deconv_valid_fwd(x, w, s):
    """VALID transposed conv, out = in*stride + k - stride (core.py:137-140).

    Expressed directly as the lhs-dilated conv `lax.conv_transpose`
    (transpose_kernel=False) lowers to; for k >= s (all this model's
    deconvs) the VALID pads are exactly (k-1, k-1)."""
    k = w.shape[:2]
    assert k[0] >= s[0] and k[1] >= s[1], (k, s)
    return lax.conv_general_dilated(
        x, w, (1, 1), [(k[0] - 1, k[0] - 1), (k[1] - 1, k[1] - 1)],
        lhs_dilation=s, dimension_numbers=("NHWC", "HWIO", "NHWC"))


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def deconv_valid(x, w, s):
    """`_deconv_valid_fwd` with a reverse-free hand-written VJP.

    XLA's transpose rule for lhs-dilated convs spatially reverses the full
    output COTANGENT (for the U-Net's last deconv at batch 128 that is a
    287 MB bf16 tensor, materialized as reverse + two layout copies ≈ 5 ms
    of the 60 ms train step — tools/roofline.py). The reversal
    algebraically belongs on the kernel side: dX is a strided VALID conv of
    ct with the spatially-flipped kernel, and dW is a rhs-dilated conv of
    ct with x whose (k_h, k_w, ci, co) result is flipped — both flips touch
    only kernel-sized tensors. Gradients match autodiff to f32
    reduction-order noise (tests/test_model.py::test_deconv_custom_vjp_matches_stock)."""
    return _deconv_valid_fwd(x, w, s)


def _deconv_valid_vjp_fwd(x, w, s):
    return _deconv_valid_fwd(x, w, s), (x, w)


def _deconv_valid_vjp_bwd(s, res, ct):
    x, w = res
    # dX[b,i,ci] = sum_{t,co} ct[b, i*s + (k-1-t), co] * w[t,ci,co]
    dx = lax.conv_general_dilated(
        ct, jnp.flip(w, (0, 1)), window_strides=s, padding=[(0, 0), (0, 0)],
        dimension_numbers=("NHWC", "HWOI", "NHWC"))
    # dW[k-1-q, ci, co] = sum_{b,i} ct[b, q + i*s, co] * x[b,i,ci]
    #   (conv over ct's spatial dims with x as an s-dilated kernel;
    #    batch b is the contraction "feature", co the conv "batch")
    dw = lax.conv_general_dilated(
        ct, x, window_strides=(1, 1), padding=[(0, 0), (0, 0)],
        rhs_dilation=s, dimension_numbers=("CHWN", "IHWO", "NHWC"))
    dw = jnp.flip(jnp.transpose(dw, (1, 2, 3, 0)), (0, 1))
    return dx.astype(x.dtype), dw.astype(w.dtype)


deconv_valid.defvjp(_deconv_valid_vjp_fwd, _deconv_valid_vjp_bwd)


class _DeconvValidCore(nn.Module):
    """Param-compatible replacement for flax ConvTranspose(padding=VALID):
    same param names/shapes/init under the same module name, so checkpoint
    trees are bit-identical either way."""

    features: int
    kernel_size: tuple
    strides: tuple
    use_bias: bool
    dtype: jnp.dtype | None

    @nn.compact
    def __call__(self, x):
        k = tuple(self.kernel_size)
        kernel = self.param("kernel", glorot_uniform(),
                            k + (x.shape[-1], self.features))
        bias = (self.param("bias", zeros_init(), (self.features,))
                if self.use_bias else None)
        x, kernel, bias = nn.dtypes.promote_dtype(
            x, kernel, bias, dtype=self.dtype)
        y = deconv_valid(x, kernel, tuple(self.strides))
        return y if bias is None else y + bias


class Deconv2D(nn.Module):
    """deconv_2d parity: VALID transposed conv, out = in*stride + k - stride.

    `custom_vjp=True` (default) routes through `deconv_valid`, numerically
    identical forward to flax ConvTranspose (same lhs-dilated conv) with a
    hand-written backward that avoids XLA's full-cotangent reverse; False
    keeps the stock ConvTranspose path (A/B + escape hatch)."""

    features: int
    kernel_size: Sequence[int]
    strides: Sequence[int] = (1, 1)
    use_bias: bool = True
    activation: Callable | None = None
    dtype: jnp.dtype | None = None
    custom_vjp: bool = True

    @nn.compact
    def __call__(self, x):
        if self.custom_vjp:
            y = _DeconvValidCore(self.features, tuple(self.kernel_size),
                                 tuple(self.strides), self.use_bias,
                                 self.dtype, name="deconv")(x)
        else:
            y = nn.ConvTranspose(self.features, tuple(self.kernel_size),
                                 strides=tuple(self.strides), padding="VALID",
                                 use_bias=self.use_bias,
                                 kernel_init=glorot_uniform(),
                                 bias_init=zeros_init(), dtype=self.dtype,
                                 name="deconv")(x)
        return self.activation(y) if self.activation else y


def loc_output_init(stddev: float = 0.001):
    """Localization output init (model.py:255): truncated normal, tiny stddev."""
    return truncated_normal(stddev)


def l2_regularization(params, weight_decay: float = 5e-4,
                      exclude: Sequence[str] = ()) -> jnp.ndarray:
    """Sum of wd/2 * ||kernel||^2 over all conv/dense kernels.

    Matches TF's l2_regularizer(scale)=scale*sum(w^2)/2 collection
    (core.py:47-70). Skips biases and BN scale/offset; `exclude` lists
    path substrings (joined with '/') also exempted — e.g. the localization
    output layer created with weight_decay=0 (model.py:253-256).
    """
    import jax

    def walk(path, leaf):
        names = [getattr(k, "key", str(k)) for k in path]
        if names[-1] != "kernel":
            return 0.0
        joined = "/".join(names)
        if any(pat in joined for pat in exclude):
            return 0.0
        return jnp.sum(leaf.astype(jnp.float32) ** 2)

    leaves = jax.tree_util.tree_map_with_path(walk, params)
    total = sum(jax.tree_util.tree_leaves(leaves))
    return 0.5 * weight_decay * total
