"""Flax ResNet18 matching the reference's visual encoder.

Architecture parity with pyutils/tflib/models/image/resnet.py:110-249
(plain two-conv residual blocks, 1x1 *un-normalized, bias-free* shortcut conv
on channel-changing stages, max-pool shortcut otherwise, `truncate_at` early
exit). NHWC layout, BN momentum 0.99 / eps 1e-3.

Reference quirk mirrored on purpose: the model instantiates ResNet18 with
is_training == finetune == True even at eval (model.py:196-197 with
model.py:388), so BatchNorm uses batch statistics in both modes. The
`bn_batch_stats` flag (default True) reproduces this; set False for
conventional inference with running averages.

`load_npy_weights` maps the reference's resnet18.npy dict (flat TF var names
like 'conv1/conv/weights', 'conv2_1/conv_1/weights', '.../bn/gamma') onto the
Flax parameter tree for pretrained-ImageNet initialization.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp

from spatialaudiogen_tpu.models.layers import Conv2D

STAGES = ("conv2", "conv3", "conv4", "conv5")
FILTERS = (64, 64, 128, 256, 512)


class ResidualBlock(nn.Module):
    """Identity-shortcut block (resnet.py:233-249)."""

    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool):
        c = x.shape[-1]
        y = Conv2D(c, (3, 3), (1, 1), padding="SAME", use_bias=False, use_batch_norm=True,
                   activation=nn.relu, dtype=self.dtype, name="conv_1")(x, train)
        y = Conv2D(c, (3, 3), (1, 1), padding="SAME", use_bias=False, use_batch_norm=True,
                   activation=None, dtype=self.dtype, name="conv_2")(y, train)
        return nn.relu(y + x)


class DownsampleBlock(nn.Module):
    """Channel-changing block with conv shortcut (resnet.py:205-231)."""

    features: int
    strides: int = 2
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool):
        in_c = x.shape[-1]
        if in_c == self.features:
            if self.strides == 1:
                shortcut = x
            else:
                shortcut = nn.max_pool(x, (self.strides, self.strides),
                                       (self.strides, self.strides), "VALID")
        else:
            # Plain 1x1 conv: no BN, no bias (resnet.py:216-217).
            shortcut = Conv2D(self.features, (1, 1), (self.strides, self.strides),
                              padding="SAME", use_bias=False, use_batch_norm=False,
                              activation=None, dtype=self.dtype, name="shortcut")(x, train)
        y = Conv2D(self.features, (3, 3), (self.strides, self.strides), padding="SAME",
                   use_bias=False, use_batch_norm=True, activation=nn.relu,
                   dtype=self.dtype, name="conv_1")(x, train)
        y = Conv2D(self.features, (3, 3), (1, 1), padding="SAME", use_bias=False,
                   use_batch_norm=True, activation=None, dtype=self.dtype, name="conv_2")(y, train)
        return nn.relu(y + shortcut)


class ResNet18(nn.Module):
    truncate_at: str | None = None  # e.g. 'conv5_2'
    num_classes: int = 1000
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = True):
        ends = {}
        y = Conv2D(FILTERS[0], (7, 7), (2, 2), padding="SAME", use_bias=False,
                   use_batch_norm=True, activation=nn.relu, dtype=self.dtype,
                   name="conv1")(x, train)
        y = nn.max_pool(y, (3, 3), (2, 2), "SAME")
        ends["conv1"] = y
        if self.truncate_at == "conv1":
            return y, ends

        for stage_idx, stage in enumerate(STAGES):
            feats = FILTERS[stage_idx + 1]
            for block_idx in (1, 2):
                name = f"{stage}_{block_idx}"
                if block_idx == 1 and stage != "conv2":
                    y = DownsampleBlock(feats, 2, dtype=self.dtype, name=name)(y, train)
                else:
                    y = ResidualBlock(dtype=self.dtype, name=name)(y, train)
                ends[name] = y
                if self.truncate_at == name:
                    return y, ends

        y = jnp.mean(y, axis=(1, 2))
        y = nn.Dense(self.num_classes, name="fc")(y)
        ends["fc"] = y
        return y, ends


class BottleneckBlock(nn.Module):
    """1x1-3x3-1x1 bottleneck with optional conv shortcut (resnet.py:33-41)."""

    b2a: int
    b2b: int
    b2c: int
    b1: int | None = None
    downsample: bool = False
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool):
        s = 2 if self.downsample else 1
        if self.b1 is not None:
            shortcut = Conv2D(self.b1, (1, 1), (s, s), padding="SAME", use_bias=False,
                              use_batch_norm=True, activation=None, dtype=self.dtype,
                              name="branch1")(x, train)
        else:
            shortcut = x
        y = Conv2D(self.b2a, (1, 1), (s, s), padding="SAME", use_bias=False,
                   use_batch_norm=True, activation=nn.relu, dtype=self.dtype,
                   name="branch2a")(x, train)
        y = Conv2D(self.b2b, (3, 3), (1, 1), padding="SAME", use_bias=False,
                   use_batch_norm=True, activation=nn.relu, dtype=self.dtype,
                   name="branch2b")(y, train)
        y = Conv2D(self.b2c, (1, 1), (1, 1), padding="SAME", use_bias=False,
                   use_batch_norm=True, activation=None, dtype=self.dtype,
                   name="branch2c")(y, train)
        return nn.relu(y + shortcut)


class ResNetBottleneck(nn.Module):
    """ResNet-50/101/152 with caffe-style block names (res2a..res5c) and
    truncate_at early exit (reference resnet.py:251-449)."""

    stage_blocks: tuple = (3, 4, 6, 3)  # ResNet50
    truncate_at: str | None = None
    num_classes: int = 1000
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = True):
        ends = {}
        y = Conv2D(64, (7, 7), (2, 2), padding="SAME", use_bias=False,
                   use_batch_norm=True, activation=nn.relu, dtype=self.dtype,
                   name="conv1")(x, train)
        y = nn.max_pool(y, (3, 3), (2, 2), "SAME")
        ends["conv1"] = y
        if self.truncate_at == "conv1":
            return y, ends

        widths = ((64, 64, 256), (128, 128, 512), (256, 256, 1024), (512, 512, 2048))
        for stage_idx, n_blocks in enumerate(self.stage_blocks):
            b2a, b2b, b2c = widths[stage_idx]
            for block_idx in range(n_blocks):
                # caffe naming: res2a..res2c; stages with >26 blocks (152's
                # res4) switch to the msra 'b{i}' style
                if n_blocks <= 26:
                    letter = chr(ord("a") + block_idx)
                else:
                    letter = "a" if block_idx == 0 else f"b{block_idx}"
                name = f"res{stage_idx + 2}{letter}"
                first = block_idx == 0
                y = BottleneckBlock(
                    b2a, b2b, b2c, b1=b2c if first else None,
                    downsample=first and stage_idx > 0, dtype=self.dtype,
                    name=name)(y, train)
                ends[name] = y
                if self.truncate_at == name:
                    return y, ends
        y = jnp.mean(y, axis=(1, 2))
        y = nn.Dense(self.num_classes, name="fc1000")(y)
        ends["fc1000"] = y
        return y, ends


def ResNet50(**kw):
    return ResNetBottleneck(stage_blocks=(3, 4, 6, 3), **kw)


def ResNet101(**kw):
    return ResNetBottleneck(stage_blocks=(3, 4, 23, 3), **kw)


def ResNet152(**kw):
    return ResNetBottleneck(stage_blocks=(3, 8, 36, 3), **kw)


def load_caffe_style_npy(npy_path: str, variables: dict, in_channels: int = 3):
    """Load ResNet-50/101/152 npy blobs keyed 'res2a_branch2a'/'bn2a_branch2a'
    (reference resnet.py:43-106 layout) into Flax variables."""
    import numpy as np

    from spatialaudiogen_tpu.models.convert import restore_tf_var_dict

    raw = np.load(npy_path, allow_pickle=True)
    blob = raw.item() if hasattr(raw, "item") else dict(raw)
    tf_vars = {}
    for key, val in blob.items():
        if key.startswith("res") and isinstance(val, dict):
            scope = key.replace("_", "/", 1)           # res2a_branch2a -> res2a/branch2a
            tf_vars[f"{scope}/weights"] = val["weights"]
        elif key.startswith("bn") and isinstance(val, dict):
            scope = "res" + key[2:].replace("_", "/", 1)  # bn2a_branch2a -> res2a/branch2a
            tf_vars[f"{scope}/bn/gamma"] = val["scale"]
            tf_vars[f"{scope}/bn/beta"] = val["offset"]
            tf_vars[f"{scope}/bn/moving_mean"] = val["mean"]
            tf_vars[f"{scope}/bn/moving_variance"] = val["variance"]
        elif key == "conv1" and isinstance(val, dict):
            tf_vars["conv1/weights"] = val["weights"]
        elif key == "bn_conv1" and isinstance(val, dict):
            tf_vars["conv1/bn/gamma"] = val["scale"]
            tf_vars["conv1/bn/beta"] = val["offset"]
            tf_vars["conv1/bn/moving_mean"] = val["mean"]
            tf_vars["conv1/bn/moving_variance"] = val["variance"]
        elif key == "fc1000" and isinstance(val, dict):
            tf_vars["fc1000/weights"] = val["weights"]
            tf_vars["fc1000/biases"] = val["biases"]
    return restore_tf_var_dict(tf_vars, variables, conv1_in_channels=in_channels)


def load_npy_weights(npy_path, variables: dict, in_channels: int = 3,
                     prefix: str = ""):
    """Load a reference-style resnet18.npy (flat TF var-name dict) into Flax
    variables (see models.convert for the name mapping). conv1 kernels are
    channel-sliced to `in_channels` (reference resnet.py:49 behavior).
    `npy_path` may also be a pre-loaded dict so multi-encoder restores
    deserialize the blob once (train.trainer._load_pretrained_visual)."""
    import numpy as np

    from spatialaudiogen_tpu.models.convert import restore_tf_var_dict

    if isinstance(npy_path, dict):
        blob = npy_path
    else:
        raw = np.load(npy_path, allow_pickle=True)
        blob = raw.item() if hasattr(raw, "item") else dict(raw)
    if prefix:
        blob = {f"{prefix}/{k}": v for k, v in blob.items()}
    return restore_tf_var_dict(blob, variables, conv1_in_channels=in_channels)
