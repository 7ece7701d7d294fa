"""Sharded, async orbax checkpointing (replaces tf.train.Saver,
reference train.py:155,223-225 — ours must be its multi-chip superset).

Layout: model_dir/checkpoints/<step>/ managed by an orbax CheckpointManager
with max_to_keep=1 (reference behavior).

Multi-chip correctness rules this module encodes:

* Arrays are saved AS SHARDED — no ``jax.device_get`` anywhere. On a
  multi-process mesh ``device_get`` of a non-addressable array raises, and
  even single-process it funnels every byte through one host buffer. Orbax
  writes each host's addressable shards directly.
* Saves are ASYNC: the blocking part of ``CheckpointManager.save`` is only
  the device->host snapshot; the storage write runs on a background thread,
  so the train-step loop is not stalled. Because the snapshot happens
  inside ``save()``, it is safe for the caller to immediately feed the
  state into a buffer-donating jitted step afterwards.
* Restore RESHARDS to the target: the abstract pytree handed to
  ``StandardRestore`` carries each leaf's sharding from ``target_state``,
  so a checkpoint written on a (4,2) mesh restores onto (2,1), (1,1), or a
  single chip unchanged (tests/test_checkpoint_sharded.py pins this
  bitwise).
"""

from __future__ import annotations

import os

import jax
import numpy as np


def _drain_queue(state) -> None:
    """Make sure `state` is materialized before orbax snapshots it.

    ``jax.block_until_ready`` does not reliably block through the axon TPU
    tunnel (CLAUDE.md); fetching a device value does, and the execution
    queue is in-order, so one fetch of any leaf produced by the last step
    program guarantees the whole state is ready. Only a fully-replicated
    leaf is fetched (smallest one, normally the scalar ``step``): on a
    multi-process mesh every process holds a full copy of a replicated
    array, while fetching a non-addressable shard would raise.
    """
    jax.block_until_ready(state)
    best = None
    for leaf in jax.tree_util.tree_leaves(state):
        if isinstance(leaf, jax.Array) and getattr(leaf, "is_fully_replicated", False):
            if best is None or leaf.size < best.size:
                best = leaf
    if best is not None:
        np.asarray(jax.device_get(best))


def _abstract_like(target_state):
    """ShapeDtypeStruct tree carrying the target's shardings (drives orbax's
    reshard-on-restore); non-array leaves pass through unchanged."""
    return jax.tree_util.tree_map(
        lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype,
                                       sharding=getattr(x, "sharding", None))
        if hasattr(x, "shape") else x,
        target_state)


class Checkpointer:
    """Persistent async checkpoint manager for one model_dir.

    Hold one instance for the life of a training run (the Trainer does);
    re-creating a manager per save defeats async and re-scans the directory
    every time. ``save`` returns as soon as the device->host snapshot is
    done; call ``wait`` (or ``close``) to join the background write.
    """

    def __init__(self, model_dir: str, max_to_keep: int = 1):
        import orbax.checkpoint as ocp

        path = os.path.abspath(os.path.join(model_dir, "checkpoints"))
        os.makedirs(path, exist_ok=True)
        options = ocp.CheckpointManagerOptions(
            max_to_keep=max_to_keep, create=True,
            enable_async_checkpointing=True)
        self._mgr = ocp.CheckpointManager(path, options=options)
        # steps saved by THIS instance only: a step number left by a
        # PREVIOUS run into the same model_dir must be overwritten with the
        # new state (tf.train.Saver semantics), not deduped — deduping it
        # silently kept the stale weights while printing "Saving model."
        self._last_saved = None

    def save(self, step: int, state, wait: bool = False) -> None:
        import orbax.checkpoint as ocp

        if self._last_saved == int(step):
            # the trainer's exit path right after a ckpt_every save of the
            # SAME state at the same step — orbax would raise
            # StepAlreadyExists and a rewrite would be a no-op
            if wait:
                self._mgr.wait_until_finished()
            return
        if int(step) in self._mgr.all_steps():
            # stale step from a previous (non-resumed) run: overwrite
            self._mgr.wait_until_finished()
            self._mgr.delete(int(step))
        _drain_queue(state)
        # orbax itself joins any still-in-flight previous save first
        self._mgr.save(int(step), args=ocp.args.StandardSave(state))
        self._last_saved = int(step)
        if wait:
            self._mgr.wait_until_finished()

    def latest_step(self):
        return self._mgr.latest_step()

    def restore(self, target_state):
        """Restore the latest checkpoint resharded to target_state's
        shardings; (target_state, None) if no checkpoint exists."""
        import orbax.checkpoint as ocp

        step = self._mgr.latest_step()
        if step is None:
            return target_state, None
        self._mgr.wait_until_finished()
        restored = self._mgr.restore(
            step, args=ocp.args.StandardRestore(_abstract_like(target_state)))
        return restored, step

    def wait(self) -> None:
        self._mgr.wait_until_finished()

    def close(self) -> None:
        self._mgr.wait_until_finished()
        self._mgr.close()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()


def save_checkpoint(model_dir: str, state, step: int, max_to_keep: int = 1):
    """One-shot synchronous save (tools/tests). Training loops should hold a
    Checkpointer instead to get async saves."""
    with Checkpointer(model_dir, max_to_keep) as ckpt:
        ckpt.save(step, state, wait=True)


def latest_step(model_dir: str):
    with Checkpointer(model_dir) as ckpt:
        return ckpt.latest_step()


def restore_checkpoint(model_dir: str, target_state):
    """Restore the latest checkpoint into the structure/shardings of
    target_state (returns target_state unchanged if no checkpoint exists)."""
    with Checkpointer(model_dir) as ckpt:
        return ckpt.restore(target_state)
