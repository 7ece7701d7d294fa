"""Multi-process (multi-host) runtime: 2 trainer processes x 4 CPU devices
must equal the single-process 8-device run.

The reference has no distributed backend at all (SURVEY 2.5); this is the
framework's pod-scale path: jax.distributed.initialize via the trainer CLI's
--coordinator/--process_id/--n_processes flags, per-process feeder shards
(data/pipeline.py shard_id/num_shards), and global batch assembly through
jax.make_array_from_process_local_data (parallel/distributed.py).

The parity oracle: the global batch a 2-process run assembles is, by
construction, [process-0 shard rows; process-1 shard rows]. The baseline
rebuilds exactly that batch single-process (two Feeder instances with
shard (0,2)/(1,2) and the trainer's seeding), runs the same jitted step on
the 8-device mesh, and the losses and post-training parameters must match.
The distributed run also exercises multi-process orbax: the checkpoint its
exit path saves is restored HERE (single-process) and compared.
"""

import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


GLOBAL_BATCH = 8
N_STEPS = 2
CLI_ARGS = ["--encoders", "audio", "--separation", "none",
            "--n_iters", str(N_STEPS), "--batch_size", str(GLOBAL_BATCH),
            "--n_workers", "1", "--log_every", "1", "--ckpt_every", "0",
            "--n_data", "8", "--seed", "0"]


def test_two_process_train_matches_single_process(tmp_path):
    from spatialaudiogen_tpu.data.synthetic import make_synthetic_dataset

    db = str(tmp_path / "db")
    make_synthetic_dataset(db, n_videos=2, duration=4.0, frame_hw=(16, 32),
                           seed=7)
    model_dir = str(tmp_path / "model")
    port = _free_port()

    env = dict(os.environ)
    env.update({
        "JAX_PLATFORMS": "cpu",
        "XLA_FLAGS": "--xla_force_host_platform_device_count=4",
        "PYTHONPATH": REPO,  # CPU-only children: the axon plugin must NOT load
        "SAG_JAX_CACHE": str(tmp_path / "jax_cache"),
    })
    procs = [
        subprocess.Popen(
            [sys.executable, "-m", "spatialaudiogen_tpu.cli.train",
             db, model_dir, *CLI_ARGS,
             "--coordinator", f"localhost:{port}",
             "--n_processes", "2", "--process_id", str(pid)],
            env=env, cwd=REPO,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True)
        for pid in (0, 1)]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=900)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"process {pid} failed:\n{out[-4000:]}"

    # --- baseline: same global batches, single process, 8 CPU devices ---
    import jax

    from spatialaudiogen_tpu.config import TrainConfig
    from spatialaudiogen_tpu.data.pipeline import Feeder
    from spatialaudiogen_tpu.data.readers import img_prep_u8
    from spatialaudiogen_tpu.models import SptAudioGen
    from spatialaudiogen_tpu.parallel.mesh import batch_sharding, make_mesh
    from spatialaudiogen_tpu.train.lr import make_optimizer
    from spatialaudiogen_tpu.train.state import create_train_state
    from spatialaudiogen_tpu.train.steps import jit_sharded, make_train_step

    cfg = TrainConfig(db_dir=db, model_dir=str(tmp_path / "baseline"),
                      encoders=("audio",), separation="none",
                      n_iters=N_STEPS, batch_size=GLOBAL_BATCH, n_workers=1,
                      log_every=1, ckpt_every=0, n_data=8, seed=0)
    feeders = [
        Feeder(db, ambi_order=cfg.ambi_order, audio_rate=cfg.audio_rate,
               video_rate=cfg.video_rate, context=cfg.context,
               duration=cfg.sample_dur, return_video=False,
               img_prep=img_prep_u8, return_flow=False,
               batch_size=GLOBAL_BATCH // 2, n_workers=1, for_eval=False,
               seed=cfg.seed, shard_id=k, num_shards=2).start()
        for k in (0, 1)]
    try:
        iters = [f.batches() for f in feeders]
        global_batches = []
        for _ in range(N_STEPS):
            locals_ = [next(it) for it in iters]
            global_batches.append({
                k: np.concatenate([b[k] for b in locals_], axis=0)
                for k in locals_[0] if k != "id"})
    finally:
        for f in feeders:
            f.stop()

    mesh = make_mesh(8, 1)
    model = SptAudioGen(cfg.model_config())
    tx = make_optimizer(cfg.lr, cfg.lr_decay, cfg.lr_iters, cfg.clip_norm)
    example = {"ambix": global_batches[0]["ambix"],
               "audio_mask": global_batches[0]["audio_mask"]}
    state = create_train_state(model, tx, jax.random.PRNGKey(cfg.seed), example)
    step_fn, shardings = jit_sharded(
        make_train_step(model, tx, cfg.weight_decay), state, tx, mesh)
    state = jax.device_put(state, shardings)
    bshard = batch_sharding(mesh)
    losses = []
    for batch in global_batches:
        state, metrics = step_fn(state, jax.device_put(batch, bshard))
        losses.append(float(metrics["total_loss"]))

    # --- losses: process 0's metrics.jsonl vs the baseline steps ---
    recs = [json.loads(line) for line in
            open(os.path.join(model_dir, "metrics.jsonl"))]
    dist_losses = [r["total_loss"] for r in recs if r["tag"] == "TRAIN"]
    assert len(dist_losses) == N_STEPS, recs
    np.testing.assert_allclose(dist_losses, losses, rtol=1e-5)

    # --- params: restore the 2-process checkpoint single-process ---
    from spatialaudiogen_tpu.train.checkpoint import restore_checkpoint

    restored, step = restore_checkpoint(model_dir, state)
    assert step == N_STEPS
    ref_leaves = jax.tree_util.tree_leaves(jax.device_get(state.params))
    got_leaves = jax.tree_util.tree_leaves(jax.device_get(restored.params))
    assert len(ref_leaves) == len(got_leaves)
    n_loose, n_total = 0, 0
    for ref, got in zip(ref_leaves, got_leaves):
        # cross-process collectives reduce in a different order than the
        # single-process program; Adam's m/(sqrt(v)+eps) amplifies the
        # resulting ~1-ulp gradient differences on near-zero coordinates
        # up to the lr*steps = 2e-4 worst case (same mechanism as the
        # u8-transport bound pinned in tests/test_trainer.py). Observed:
        # O(1) elements per million off by ~1e-5 after 2 steps.
        diff = np.abs(np.asarray(got) - np.asarray(ref))
        assert diff.max() <= N_STEPS * 1e-4 + 1e-7, diff.max()
        n_loose += int((diff > 1e-5).sum())
        n_total += diff.size
    assert n_loose <= max(20, n_total // 100000), (n_loose, n_total)
