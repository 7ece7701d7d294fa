"""Orbax checkpointing (replaces tf.train.Saver, train.py:155,223-225).

Layout: model_dir/checkpoints/<step>/ managed by orbax CheckpointManager
with max_to_keep=1 (reference behavior) plus an always-updated 'latest'.
"""

from __future__ import annotations

import os

import jax


def _manager(model_dir: str, max_to_keep: int = 1):
    import orbax.checkpoint as ocp

    path = os.path.abspath(os.path.join(model_dir, "checkpoints"))
    os.makedirs(path, exist_ok=True)
    options = ocp.CheckpointManagerOptions(max_to_keep=max_to_keep, create=True)
    return ocp.CheckpointManager(path, options=options)


def save_checkpoint(model_dir: str, state, step: int, max_to_keep: int = 1):
    import orbax.checkpoint as ocp

    mgr = _manager(model_dir, max_to_keep)
    mgr.save(step, args=ocp.args.StandardSave(jax.device_get(state)))
    mgr.wait_until_finished()
    mgr.close()


def latest_step(model_dir: str):
    mgr = _manager(model_dir)
    step = mgr.latest_step()
    mgr.close()
    return step


def restore_checkpoint(model_dir: str, target_state):
    """Restore the latest checkpoint into the structure of target_state
    (returns target_state unchanged if no checkpoint exists)."""
    import orbax.checkpoint as ocp

    mgr = _manager(model_dir)
    step = mgr.latest_step()
    if step is None:
        mgr.close()
        return target_state, None
    abstract = jax.tree_util.tree_map(
        lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype, sharding=getattr(x, "sharding", None))
        if hasattr(x, "shape") else x,
        target_state)
    restored = mgr.restore(step, args=ocp.args.StandardRestore(abstract))
    mgr.close()
    return restored, step
