"""Mesh construction and sharding rules.

The reference trains on exactly one GPU (train.py:63, SURVEY 2.5); here
parallelism is first-class: a 2-D ('data', 'model') jax.sharding.Mesh where

  * 'data'  — batch data parallelism (gradients all-reduced by GSPMD over
    ICI; the batch axis of every input is sharded here)
  * 'model' — tensor parallelism for the wide dense layers (bottleneck
    fusion FCs and localization head kernels sharded on their output
    dimension); size 1 by default at this model scale, but the axis plumbing
    is in place so the same jitted step runs 1-chip to multi-slice.

Everything goes through jax.jit with NamedSharding annotations — XLA GSPMD
inserts the psum/all-gather collectives.
"""

from __future__ import annotations

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


def make_mesh(n_data: int | None = None, n_model: int = 1, devices=None) -> Mesh:
    """('data', 'model') mesh over available devices (ICI-contiguous order)."""
    devices = list(jax.devices()) if devices is None else list(devices)
    if n_data is None:
        n_data = len(devices) // n_model
    assert n_data * n_model <= len(devices), (n_data, n_model, len(devices))
    grid = np.array(devices[: n_data * n_model]).reshape(n_data, n_model)
    return Mesh(grid, (DATA_AXIS, MODEL_AXIS))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Inputs sharded on their leading (batch) axis over 'data'."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def param_sharding_specs(params, mesh: Mesh, min_tp_width: int = 1024):
    """PartitionSpec tree: wide dense kernels tensor-parallel, rest replicated.

    A 2-D kernel (in, out) is sharded P(None, 'model') when `out` is at least
    min_tp_width and divisible by the model-axis size; its bias is sharded
    P('model'). Conv kernels and BN parameters are replicated — at this
    model's conv sizes, TP collectives would cost more than they save.
    """
    n_model = mesh.shape[MODEL_AXIS]

    def rule(path, leaf):
        names = [getattr(k, "key", str(k)) for k in path]
        if n_model > 1 and leaf.ndim == 2 and names[-1] == "kernel" \
                and leaf.shape[1] >= min_tp_width and leaf.shape[1] % n_model == 0:
            return P(None, MODEL_AXIS)
        if n_model > 1 and leaf.ndim == 1 and names[-1] == "bias" \
                and leaf.shape[0] >= min_tp_width and leaf.shape[0] % n_model == 0:
            return P(MODEL_AXIS)
        return P()

    return jax.tree_util.tree_map_with_path(rule, params)


def specs_to_shardings(specs, mesh: Mesh):
    return jax.tree_util.tree_map(
        lambda s: NamedSharding(mesh, s), specs,
        is_leaf=lambda x: isinstance(x, P))


def shard_pytree(tree, specs, mesh: Mesh):
    """device_put a pytree according to a PartitionSpec tree."""
    shardings = specs_to_shardings(specs, mesh)
    return jax.tree_util.tree_map(jax.device_put, tree, shardings)
