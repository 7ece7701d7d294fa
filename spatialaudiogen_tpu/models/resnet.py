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


def load_npy_weights(npy_path: str, variables: dict, in_channels: int = 3,
                     prefix: str = ""):
    """Load a reference-style resnet18.npy (flat TF var-name dict) into Flax
    variables (see models.convert for the name mapping). conv1 kernels are
    channel-sliced to `in_channels` (reference resnet.py:49 behavior)."""
    import numpy as np

    from spatialaudiogen_tpu.models.convert import restore_tf_var_dict

    raw = np.load(npy_path, allow_pickle=True)
    blob = raw.item() if hasattr(raw, "item") else dict(raw)
    if prefix:
        blob = {f"{prefix}/{k}": v for k, v in blob.items()}
    return restore_tf_var_dict(blob, variables, conv1_in_channels=in_channels)
