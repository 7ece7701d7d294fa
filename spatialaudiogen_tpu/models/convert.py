"""TF1-variable-name <-> Flax-parameter-path conversion.

The reference ships TF1 checkpoints (README.md:70-78) and pretrained npy
blobs whose keys are TF variable paths like

    audio_encoder/conv1/weights
    video_encoder/conv2_1/conv_1/bn/moving_mean
    localization/fc3/weights

Our Flax modules are named to mirror those scopes, with two systematic
differences: wrapper submodule levels ('conv', 'deconv', 'dense') that Flax
inserts, and leaf renames (weights->kernel, gamma->scale, ...). Matching is
done on *normalized* paths — drop the wrapper levels, canonicalize leaves —
which makes the converter robust to either side's nesting.

Kernel layouts transfer directly: TF conv kernels are HWIO like Flax; TF
conv2d_transpose kernels are (H, W, out, in) while Flax ConvTranspose uses
(H, W, in, out), so deconv kernels are axis-swapped.
"""

from __future__ import annotations

import numpy as np

_LEAF_MAP = {
    "weights": "kernel",
    "biases": "bias",
    "gamma": "scale",
    "beta": "bias",
    "moving_mean": "mean",
    "moving_variance": "var",
}
_WRAPPER_LEVELS = {"conv", "deconv", "dense"}


def normalize_tf_name(name: str) -> str:
    parts = name.split("/")
    parts[-1] = _LEAF_MAP.get(parts[-1], parts[-1])
    parts = [p for i, p in enumerate(parts) if not (p in _WRAPPER_LEVELS and i < len(parts) - 1)]
    return "/".join(parts)


def _flatten(tree, prefix=()):
    out = {}
    for k, v in tree.items():
        if isinstance(v, dict):
            out.update(_flatten(v, prefix + (k,)))
        else:
            out[prefix + (k,)] = v
    return out


def _normalize_flax_path(path: tuple) -> str:
    parts = [p for i, p in enumerate(path) if not (p in _WRAPPER_LEVELS and i < len(path) - 1)]
    return "/".join(parts)


_INV_LEAF_MAP = {"kernel": "weights", "bias": "biases", "scale": "gamma",
                 "mean": "moving_mean", "var": "moving_variance"}


def to_tf_var_dict(variables: dict, transpose_deconv: bool = True) -> dict:
    """Inverse of restore_tf_var_dict: Flax variables -> {tf_var_name: array}.

    Emits the reference's TF1 variable names (weights/biases/gamma/beta/
    moving_*; resnet.py:238-249 naming) so a framework checkpoint can be
    written back into a reference-loadable bundle. Deconv kernels are
    transposed to TF's (H, W, out, in) layout.
    """
    out = {}
    index = flax_path_index(variables)
    for norm_key, (coll, path, _) in index.items():
        node = variables[coll]
        for p in path:
            node = node[p]
        value = np.asarray(node)
        parts = norm_key.split("/")
        leaf = path[-1]
        if leaf == "bias" and len(parts) >= 2 and parts[-2] == "bn":
            parts[-1] = "beta"
        else:
            parts[-1] = _INV_LEAF_MAP[leaf]
        name = "/".join(parts)
        if transpose_deconv and "deconv" in path and leaf == "kernel":
            value = value.transpose(0, 1, 3, 2)
        assert name not in out, f"tf name collision: {name}"
        out[name] = value
    return out


def flax_path_index(variables: dict) -> dict:
    """normalized path string -> (collection, tuple-path) for params+batch_stats."""
    index = {}
    for coll in ("params", "batch_stats"):
        if coll not in variables:
            continue
        for path, leaf in _flatten(variables[coll]).items():
            key = _normalize_flax_path(path)
            assert key not in index, f"normalized path collision: {key}"
            index[key] = (coll, path, leaf.shape if hasattr(leaf, "shape") else None)
    return index


def restore_tf_var_dict(tf_vars: dict, variables: dict, conv1_in_channels: int | None = None,
                        transpose_deconv: bool = True, strict: bool = False):
    """Return new Flax `variables` with values from a TF var-name dict.

    tf_vars: {tf_var_path: np.ndarray}. Unmatched TF entries are returned as
    the second element (for inspection); unmatched Flax params keep their
    current values (or raise if strict).
    """
    import jax.numpy as jnp

    index = flax_path_index(variables)
    flat_updates: dict = {}
    unmatched = {}
    for name, value in tf_vars.items():
        key = normalize_tf_name(name)
        if key not in index:
            unmatched[name] = np.shape(value)
            continue
        coll, path, shape = index[key]
        value = np.asarray(value)
        if conv1_in_channels is not None and path[-1] == "kernel" and value.ndim == 4 \
                and any(p.startswith("conv1") for p in path) and value.shape[2] > conv1_in_channels:
            value = value[:, :, :conv1_in_channels, :]
        if transpose_deconv and "deconv" in path and path[-1] == "kernel":
            # TF conv2d_transpose kernel (H, W, out, in) -> Flax (H, W, in, out)
            value = value.transpose(0, 1, 3, 2)
        if shape is not None and tuple(value.shape) != tuple(shape):
            value = value.reshape(shape)
        flat_updates[(coll,) + path] = value

    if strict:
        matched = {("params",) + p if c == "params" else ("batch_stats",) + p
                   for c, p, _ in index.values()}

    def rebuild(tree, prefix=()):
        out = {}
        for k, v in tree.items():
            p = prefix + (k,)
            if isinstance(v, dict):
                out[k] = rebuild(v, p)
            elif p in flat_updates:
                out[k] = jnp.asarray(flat_updates[p], dtype=v.dtype)
            else:
                out[k] = v
        return out

    new_vars = {coll: rebuild(variables[coll], (coll,)) for coll in variables}
    return new_vars, unmatched
