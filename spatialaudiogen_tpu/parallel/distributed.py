"""Multi-process (multi-host) runtime: process wiring + global arrays.

The reference is strictly single-process (SURVEY 2.5: one GPU, no
distributed backend of any kind). Here the missing piece between "runs on a
mesh" (single-process GSPMD over all local devices) and "runs on a pod"
(one process per TPU host, devices global across processes) is:

  * `initialize(...)` — `jax.distributed.initialize` wiring, exposed as
    `--coordinator/--process_id/--n_processes` trainer flags. After it,
    `jax.devices()` is the GLOBAL device list and the same ('data','model')
    mesh / GSPMD train step from parallel.mesh runs unchanged; XLA routes
    collectives over ICI/DCN (gloo on the CPU test backend).
  * `global_batch(...)` — each process's feeder produces only its shard of
    the global batch (data/pipeline.py shard_id/num_shards gives every
    process a disjoint video subset — the multi-host replacement for the
    reference's per-thread split, feeder.py:232-234);
    `jax.make_array_from_process_local_data` assembles the per-process
    host arrays into one global jax.Array sharded over the 'data' axis.
  * `put_like(...)` — place a host-identical pytree (fresh inits,
    pretrained blobs, converted checkpoints) onto cross-process shardings:
    `jax.device_put` cannot target non-addressable devices, so each
    process materializes its addressable shards via
    `jax.make_array_from_callback`. Every process must hold the SAME host
    values (true for seeded PRNG init and on-disk blobs).

Proven by tests/test_multiprocess.py: 2 subprocess trainers x 4 CPU
devices assemble global batches from disjoint feeder shards and match the
single-process 8-device run's loss and parameters.
"""

from __future__ import annotations

import numpy as np

import jax


def initialize(coordinator: str | None = None,
               n_processes: int | None = None,
               process_id: int | None = None,
               local_device_ids=None) -> bool:
    """Join a multi-process run; call BEFORE any other jax use.

    Returns True when distributed mode was entered. With n_processes None
    or 1 this is a no-op (single-process run, the default) — the trainer
    calls it unconditionally so the same CLI serves both modes. All three
    of coordinator/n_processes/process_id may also come from the standard
    cluster env (TPU pod metadata); passing them explicitly overrides.
    """
    if n_processes is None or n_processes <= 1:
        return False
    jax.distributed.initialize(coordinator_address=coordinator,
                               num_processes=n_processes,
                               process_id=process_id,
                               local_device_ids=local_device_ids)
    return True


def is_distributed() -> bool:
    return jax.process_count() > 1


def global_batch(arrays: dict, sharding) -> dict:
    """Assemble one global batch from this process's local shard.

    arrays: host numpy arrays of the LOCAL batch (global_batch_size /
    process_count rows). Every process calls this with its own shard; the
    returned jax.Arrays are global, sharded over the batch axis per
    `sharding` (parallel.mesh.batch_sharding). Single-process this is just
    a device_put.
    """
    if not is_distributed():
        return jax.device_put(arrays, sharding)
    return {k: jax.make_array_from_process_local_data(sharding, np.asarray(v))
            for k, v in arrays.items()}


def put_like(tree, shardings):
    """Place a host pytree onto (possibly cross-process) shardings.

    Single-process: plain device_put. Multi-process: every process holds
    the same full host value per leaf (seeded init / on-disk blob) and
    builds its addressable shards via make_array_from_callback — the
    replicated-or-sharded generalization of device_put that works when the
    sharding spans non-addressable devices.
    """
    if not is_distributed():
        return jax.tree_util.tree_map(jax.device_put, tree, shardings)

    def put_leaf(x, s):
        x = np.asarray(x)
        return jax.make_array_from_callback(x.shape, s, lambda idx: x[idx])

    return jax.tree_util.tree_map(put_leaf, tree, shardings)
