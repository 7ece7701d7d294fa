"""Training loop: feeder -> prefetch -> sharded step -> log/checkpoint.

Orchestration parity with reference train.py:62-236 (config persistence and
resume, 4 feeder workers, periodic stat prints, NaN abort, checkpoint every
ckpt_every steps and at exit) on the TPU-native stack: host worker threads
feed a double-buffered device prefetcher; the jitted DP(+TP) train step runs
over a jax.sharding.Mesh.
"""

from __future__ import annotations

import math
import signal
import time

import jax
import numpy as np

from spatialaudiogen_tpu.config import TrainConfig
from spatialaudiogen_tpu.data.pipeline import Feeder, device_prefetch
from spatialaudiogen_tpu.models import SptAudioGen
from spatialaudiogen_tpu.parallel.mesh import batch_sharding, make_mesh
from spatialaudiogen_tpu.train.checkpoint import Checkpointer
from spatialaudiogen_tpu.train.lr import make_optimizer, staircase_decay
from spatialaudiogen_tpu.train.state import create_train_state
from spatialaudiogen_tpu.train.steps import jit_sharded, make_train_step
from spatialaudiogen_tpu.utils.logging import MetricLogger


class _NullLogger:
    """Logger stand-in for non-primary processes: every MetricLogger method
    is a no-op (only process 0 writes metrics.jsonl / TensorBoard files —
    peers on a shared filesystem must not race them)."""

    def tick(self, *a, **k): pass

    def log(self, *a, **k): pass

    def log_histograms(self, *a, **k): pass

    def close(self): pass


class Trainer:
    def __init__(self, cfg: TrainConfig, mesh=None):
        self.cfg = cfg
        # multi-process (multi-host) runs: cfg.batch_size is the GLOBAL
        # batch; each process feeds batch_size/process_count rows from its
        # disjoint video shard and the prefetcher assembles the global
        # sharded array (parallel.distributed). Process 0 owns all
        # non-checkpoint file writes (config, metrics.jsonl, TB) — orbax
        # checkpointing itself is collective across processes.
        self.n_processes = jax.process_count()
        self.is_primary = jax.process_index() == 0
        assert cfg.batch_size % self.n_processes == 0, \
            (cfg.batch_size, self.n_processes)
        local_batch = cfg.batch_size // self.n_processes
        if cfg.resume:
            loaded = TrainConfig.load(cfg.model_dir)
            # architecture/geometry fields come from the stored run
            for key in ("encoders", "separation", "ambi_order", "audio_rate",
                        "video_rate", "context", "sample_dur", "num_sep_tracks",
                        "fft_window", "context_units", "freq_mask_units", "loc_units"):
                setattr(cfg, key, getattr(loaded, key))
        if self.is_primary:
            cfg.save()

        self.mesh = mesh if mesh is not None else make_mesh(cfg.n_data, cfg.n_model)
        self.model = SptAudioGen(cfg.model_config())
        self.tx = make_optimizer(cfg.lr, cfg.lr_decay, cfg.lr_iters, cfg.clip_norm)
        self.lr_schedule = staircase_decay(cfg.lr, cfg.lr_decay, cfg.lr_iters)

        from spatialaudiogen_tpu.data.readers import img_prep_u8

        self.feeder = Feeder(
            cfg.db_dir, subset_fn=cfg.subset_fn, ambi_order=cfg.ambi_order,
            audio_rate=cfg.audio_rate, video_rate=cfg.video_rate,
            context=cfg.context, duration=cfg.sample_dur,
            return_video="video" in cfg.encoders,
            img_prep=img_prep_u8,  # normalize on device (train/steps.py)
            return_flow="flow" in cfg.encoders,
            batch_size=local_batch, n_workers=cfg.n_workers,
            for_eval=False, seed=cfg.seed,
            # multi-host: each process feeds a disjoint video shard
            shard_id=jax.process_index(), num_shards=self.n_processes)

        example = self._example_batch()
        state = create_train_state(self.model, self.tx, jax.random.PRNGKey(cfg.seed),
                                   example)
        # One persistent manager for the whole run: saves are async (the
        # step loop only pays the device->host snapshot) and sharded arrays
        # are written per-host with no device_get gather.
        self.ckpt = Checkpointer(cfg.model_dir)
        if cfg.pretrained_resnet:
            # Applies only when no checkpoint will be restored — keyed on
            # actual checkpoint presence, not the --resume flag, so a
            # killed-before-first-checkpoint rerun still gets the
            # pretrained init instead of silent random weights.
            if cfg.resume and self.ckpt.latest_step() is not None:
                print("--pretrained_resnet ignored: resuming from a "
                      "checkpoint (pretrained init only applies to fresh "
                      "runs)")
            else:
                state = self._load_pretrained_visual(state, cfg.pretrained_resnet)
        self.step_fn, self.state_shardings = jit_sharded(
            make_train_step(self.model, self.tx, cfg.weight_decay),
            state, self.tx, self.mesh)
        self.observe_fn = None
        if cfg.tb_histograms:
            from spatialaudiogen_tpu.train.steps import make_observe_step

            # grads (+ optionally tapped activations) for TB histograms;
            # an extra fwd+bwd dispatched only every tb_histograms steps
            self.observe_fn = jax.jit(
                make_observe_step(self.model, cfg.weight_decay,
                                  with_ends=cfg.tb_activations),
                in_shardings=(self.state_shardings, None))
        # multi-process shardings span non-addressable devices; put_like
        # materializes each process's shards from the (identical) host
        # values. Single-process it is a plain device_put.
        from spatialaudiogen_tpu.parallel.distributed import put_like

        state = put_like(state, self.state_shardings)
        self.init_step = 0
        if cfg.resume:
            state, step = self.ckpt.restore(state)
            if step is not None:
                self.init_step = int(step)
                print(f"Restored checkpoint at step {step}")
        self.state = state
        # process 0 writes metrics.jsonl/TB; peers keep a no-op logger so
        # the loop body stays branch-free
        self.logger = (MetricLogger(cfg.model_dir) if self.is_primary
                       else _NullLogger())

    def _load_pretrained_visual(self, state, npy_path: str):
        """Initialize each visual encoder from a reference-style resnet18.npy
        (restore_pretrained parity, model.py:198 / resnet.py:238-249). The
        npy's flat TF var names are prefixed with the encoder scope so the
        same ImageNet weights land in both video_encoder and flow_encoder."""
        import numpy as np

        from spatialaudiogen_tpu.models.resnet import load_npy_weights

        raw = np.load(npy_path, allow_pickle=True)
        blob = raw.item() if hasattr(raw, "item") else dict(raw)
        variables = {"params": state.params}
        if state.batch_stats:
            variables["batch_stats"] = state.batch_stats
        for enc in ("video", "flow"):
            if enc not in self.cfg.encoders:
                continue
            variables, unmatched = load_npy_weights(
                blob, variables, prefix=f"{enc}_encoder")
            print(f"Initialized {enc}_encoder from {npy_path} "
                  f"({len(unmatched)} npy entries unmatched)")
        return state.replace(
            params=variables["params"],
            batch_stats=variables.get("batch_stats", state.batch_stats))

    def _example_batch(self) -> dict:
        g = self.cfg.model_config().geometry
        b = self.cfg.batch_size
        batch = {"ambix": np.zeros((b, g.snd_size, g.num_ambi_channels), np.float32),
                 "audio_mask": np.ones((b, g.num_ambi_channels), np.float32)}
        hw = tuple(self.cfg.frame_hw)
        if "video" in self.cfg.encoders:
            batch["video"] = np.zeros((b, g.vid_dur) + hw + (3,), np.float32)
        if "flow" in self.cfg.encoders:
            batch["flow"] = np.zeros((b, g.vid_dur) + hw + (3,), np.float32)
        return batch

    def request_stop(self):
        """Ask the loop to stop at the next step boundary (checkpoint still
        saved by the exit path). Called by the SIGTERM handler; safe to call
        from any thread."""
        self._stop_requested = True

    def train(self):
        cfg = self.cfg
        bshard = batch_sharding(self.mesh)
        self.feeder.start()
        state = self.state
        step = self.init_step
        # Preemption safety: TPU workers get SIGTERM'ed (maintenance,
        # autoscaling). Stop at the next step boundary so the finally-block
        # checkpoint runs instead of dying mid-step with no save. The
        # reference's analogue only caught python exceptions (train.py:227).
        self._stop_requested = False
        # Restore-by-flag, not by value: signal.signal returns None when the
        # prior handler was installed outside Python, and the trainer's
        # handler (closing over this Trainer) must still be uninstalled then.
        prev_handler, handler_installed = None, False
        try:
            prev_handler = signal.signal(
                signal.SIGTERM,
                lambda signum, frame: (
                    print("SIGTERM: stopping at step boundary, will checkpoint"),
                    self.request_stop()))
            handler_installed = True
        except ValueError:  # not the main thread (e.g. under a test runner)
            pass
        try:
            stream = device_prefetch(self.feeder.batches(), sharding=bshard)
            t_prev = time.perf_counter()
            for dev_batch, _ in stream:
                if step >= cfg.n_iters or self._stop_requested:
                    break
                state, metrics = self.step_fn(state, dev_batch)
                if step % cfg.log_every == 0:
                    # device_get syncs the queue, so the wall time per
                    # iteration (data wait + step) is what tick records.
                    # (One device_get call batches all leaves into a single
                    # transfer — measured 41 ms for a 20-scalar dict on the
                    # tunnel, same as one packed fetch; separate np.asarray
                    # call sites are what costs a roundtrip each.)
                    metrics = {k: float(v) for k, v in
                               jax.device_get(metrics).items()}
                    metrics["lr"] = float(self.lr_schedule(step))
                    if math.isnan(metrics["total_loss"]):
                        raise FloatingPointError(
                            f"Training produced a NaN loss at step {step}.")
                now = time.perf_counter()
                self.logger.tick(now - t_prev)
                t_prev = now
                if step % cfg.log_every == 0:
                    self.logger.log(step, metrics, cfg.batch_size)
                if cfg.tb_histograms and step % cfg.tb_histograms == 0:
                    # one full-params fetch per write, so opt-in only
                    self.logger.log_histograms(step,
                                               jax.device_get(state.params))
                    # gradient (and opt-in activation) histograms — the
                    # reference's verbosity summaries (dnn.py:692-709);
                    # recomputed on this batch so the hot step stays lean
                    grads, ends = self.observe_fn(state, dev_batch)
                    self.logger.log_histograms(step, jax.device_get(grads),
                                               prefix="grads")
                    if cfg.tb_activations:
                        self.logger.log_histograms(
                            step, jax.device_get(ends), prefix="acts")
                step += 1
                if cfg.ckpt_every and step % cfg.ckpt_every == 0:
                    # async: returns after the device->host snapshot; the
                    # storage write overlaps the next training steps
                    self.ckpt.save(step, state)
                    print("=" * 60 + "\nCheckpoint save started (async)\n" + "=" * 60)
        finally:
            if self.is_primary:
                print("End of training. Saving model.")
                cfg.save()
            self.ckpt.save(step, state, wait=True)
            self.ckpt.close()
            self.state = state
            self.feeder.stop()
            self.logger.close()
            if handler_installed:
                signal.signal(signal.SIGTERM,
                              prev_handler if prev_handler is not None
                              else signal.SIG_DFL)
        return state, step
