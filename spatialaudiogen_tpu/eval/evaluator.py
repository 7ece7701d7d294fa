"""Evaluator: one deterministic pass over the test split, full metric battery.

Parity with reference eval.py:29-233: restores the latest checkpoint from
model_dir (config from train-params), iterates the eval feeder (duration
0.1 s, skip_rate 10), computes on-device stft/lsd/mse/snr per sample plus
host-side mel-LSD, envelope and EMD (ang_res=30), and writes
model_dir/eval-detailed.txt with one line per sample for
parse_eval_results-style aggregation.

TPU-minded deviations: the device metrics run as one jitted step per batch;
the host metrics run in a thread pool overlapped with the next device batch;
the final partial batch is zero-padded on device and truncated on host
(the reference silently drops it).
"""

from __future__ import annotations

import os
import time
from collections import OrderedDict
from concurrent.futures import ThreadPoolExecutor

import jax
import numpy as np

from spatialaudiogen_tpu.ambisonics.emd import ambix_emd
from spatialaudiogen_tpu.config import TrainConfig
from spatialaudiogen_tpu.data.pipeline import Feeder
from spatialaudiogen_tpu.data.readers import img_prep_u8
from spatialaudiogen_tpu.eval.host_metrics import compute_envelope_dist, compute_mel_lsd
from spatialaudiogen_tpu.models import SptAudioGen
from spatialaudiogen_tpu.models.metrics import METRIC_SCALES
from spatialaudiogen_tpu.train.checkpoint import restore_checkpoint
from spatialaudiogen_tpu.train.lr import make_optimizer
from spatialaudiogen_tpu.train.state import create_train_state
from spatialaudiogen_tpu.train.steps import make_eval_step

ALL_METRICS = [
    "amplitude/predicted", "amplitude/gt",
    "mse/avg", "mse/X", "mse/Y", "mse/Z",
    "stft/avg", "stft/X", "stft/Y", "stft/Z",
    "lsd/avg", "lsd/X", "lsd/Y", "lsd/Z",
    "mel_lsd/avg", "mel_lsd/X", "mel_lsd/Y", "mel_lsd/Z",
    "snr/avg", "snr/X", "snr/Y", "snr/Z",
    "env_mse/avg", "env_mse/X", "env_mse/Y", "env_mse/Z",
    "emd/dir", "emd/dir2",
]
EVAL_DURATION = 0.1   # eval.py:43
EVAL_BATCH = 16       # eval.py:44 (hardcoded there as well)


class Evaluator:
    def __init__(self, model_dir: str, subset_fn: str | None = None,
                 batch_size: int = EVAL_BATCH, db_dir: str | None = None,
                 n_workers: int = 4, emd_ang_res: float = 30,
                 mesh=None, compute_dtype: str | None = None,
                 shard_id: int | None = None, num_shards: int | None = None,
                 emd_mode: str = "exact", device_metrics: bool = False):
        self.cfg = TrainConfig.load(model_dir, compute_dtype=compute_dtype)
        self.cfg.model_dir = model_dir
        if db_dir is not None:
            self.cfg.db_dir = db_dir
        self.cfg.sample_dur = EVAL_DURATION
        self.batch_size = batch_size
        self.emd_ang_res = emd_ang_res
        # "exact": per-sample native min-cost-flow EMD in the host pool
        # (reference pyemd semantics). "sinkhorn": the whole batch's EMD
        # solved on-device in one jitted annealed-Sinkhorn call
        # (ops/sinkhorn.py; matches exact to ~1e-5 absolute, see
        # tests/test_sinkhorn.py) — the host pool then only computes
        # mel-LSD/envelope, which removes the dominant host metric at
        # large eval scale.
        assert emd_mode in ("exact", "sinkhorn"), emd_mode
        self.emd_mode = emd_mode
        self._emd_device_fn = None
        if emd_mode == "sinkhorn":
            from spatialaudiogen_tpu.ops.sinkhorn import ambix_emd_batch_fn

            # window=0.1 unconditionally: the exact path (ambix_emd ->
            # SphericalAmbisonicsVisualizer) hardcodes 0.1 s map frames
            # (reference distance.py:131), independent of EVAL_DURATION.
            emd_metric = ambix_emd_batch_fn(
                self.cfg.audio_rate, float(emd_ang_res),
                order=self.cfg.ambi_order, window=0.1)

            def device_emd(pred, mono, target, layout):
                import jax.numpy as jnp

                pred_m = jnp.concatenate([mono, pred], axis=2) * layout[:, None, :]
                gt_m = jnp.concatenate([mono, target], axis=2) * layout[:, None, :]
                return emd_metric(pred_m, gt_m)

            self._emd_device_fn = jax.jit(device_emd)
            _raw_emd = device_emd
        # device_metrics: mel-LSD + Hilbert-envelope computed as MXU
        # matmuls per batch (ops/eval_metrics.py, matches the f64 host
        # implementations to ~1e-6); with --emd sinkhorn as well, the
        # whole battery runs on-chip and the host pool only formats rows.
        self._spectral_device_fn = None
        if device_metrics:
            from spatialaudiogen_tpu.ops.eval_metrics import (
                envelope_dist_fn, mel_lsd_batch_fn)

            g = self.cfg.model_config().geometry
            mel_fn = mel_lsd_batch_fn(self.cfg.audio_rate)
            env_fn = envelope_dist_fn(g.snd_dur)

            def spectral(pred, target):
                import jax.numpy as jnp

                # amplitudes ride along so the fully-on-device mode
                # (together with emd_mode="sinkhorn") never needs the
                # ~2 MB/batch prediction fetch at all
                amp = (jnp.max(jnp.abs(pred), axis=(1, 2)),
                       jnp.max(jnp.abs(target), axis=(1, 2)))
                return mel_fn(pred, target), env_fn(pred, target), amp

            self._spectral_device_fn = jax.jit(spectral)
        # Fully-on-device battery: ONE packed (B, 22) result per batch.
        # On a tunneled host every np.asarray is a ~30-40 ms roundtrip, so
        # fetching stft/lsd/mse/snr leaves + emd pair + spectral triple
        # separately costs ~8 roundtrips/batch; the pack makes it one.
        self._battery_device_fn = None
        if self._emd_device_fn is not None and self._spectral_device_fn is not None:

            def battery(pred, mono, target, layout, stft_d, lsd, mse, snr):
                import jax.numpy as jnp

                d1, d2 = _raw_emd(pred, mono, target, layout)
                mel, env, amp = spectral(pred, target)
                return jnp.concatenate(
                    [stft_d, lsd, mse, snr, mel, env, d1[:, None], d2[:, None],
                     amp[0][:, None], amp[1][:, None]], axis=1)

            self._battery_device_fn = jax.jit(battery)
        self.model = SptAudioGen(self.cfg.model_config())
        # multi-chip eval: shard the (padded, fixed-size) batch over the
        # mesh's data axis; the restored state is replicated.
        self.mesh = mesh
        self.eval_fn = jax.jit(make_eval_step(self.model))
        self._batch_sharding = None
        if mesh is not None:
            from spatialaudiogen_tpu.parallel.mesh import batch_sharding

            assert batch_size % mesh.shape["data"] == 0, \
                "eval batch must divide the data axis"
            self._batch_sharding = batch_sharding(mesh)

        tx = make_optimizer()
        # multi-host eval: each process scores a disjoint video shard
        # (mirrors train/trainer.py; reference analogue is the per-thread
        # split, feeder.py:232-234) — without this, every host would
        # duplicate the full sample set.
        self.shard_id = jax.process_index() if shard_id is None else shard_id
        self.num_shards = jax.process_count() if num_shards is None else num_shards
        self.feeder = Feeder(
            self.cfg.db_dir, subset_fn=subset_fn, ambi_order=self.cfg.ambi_order,
            audio_rate=self.cfg.audio_rate, video_rate=self.cfg.video_rate,
            context=self.cfg.context, duration=EVAL_DURATION,
            return_video="video" in self.cfg.encoders,
            img_prep=img_prep_u8,  # normalize on device (train/steps.py)
            return_flow="flow" in self.cfg.encoders,
            batch_size=batch_size, n_workers=n_workers, for_eval=True,
            shard_id=self.shard_id, num_shards=self.num_shards)

        example = self._example_batch()
        state = create_train_state(self.model, tx, jax.random.PRNGKey(0), example)
        self.state, step = restore_checkpoint(model_dir, state)
        assert step is not None, f"no checkpoint found in {model_dir}"
        self.restored_step = step
        if mesh is not None:
            from spatialaudiogen_tpu.parallel.mesh import replicated

            self.state = jax.device_put(
                self.state, jax.tree_util.tree_map(
                    lambda _: replicated(mesh), self.state))

    def _example_batch(self):
        g = self.cfg.model_config().geometry
        batch = {"ambix": np.zeros((1, g.snd_size, g.num_ambi_channels), np.float32),
                 "audio_mask": np.ones((1, g.num_ambi_channels), np.float32)}
        hw = tuple(self.cfg.frame_hw)
        if "video" in self.cfg.encoders:
            batch["video"] = np.zeros((1, g.vid_dur) + hw + (3,), np.float32)
        if "flow" in self.cfg.encoders:
            batch["flow"] = np.zeros((1, g.vid_dur) + hw + (3,), np.float32)
        return batch

    def _pad(self, batch: dict):
        n = batch["ambix"].shape[0]
        if n == self.batch_size:
            return batch, n
        out = {}
        for k, v in batch.items():
            if k == "id":
                out[k] = v
                continue
            pad = np.zeros((self.batch_size - n,) + v.shape[1:], v.dtype)
            out[k] = np.concatenate([v, pad], axis=0)
        return out, n

    def _host_metrics(self, sample):
        """Per-sample host metric computation (runs in the worker pool).

        Parity note: like the reference (eval.py:145-185 consumes the RAW
        per-sample `*_ps` tensors; model.py:110-155 applies audio_mask only
        to the batch aggregates), the per-sample records here are unmasked —
        masked channels contribute to the per-channel columns and the
        3-channel means. Only EMD applies the layout mask (eval.py:188-190).
        """
        (sid, mono, gt, pred, layout, stft_d, lsd, mse, snr, emd_pre,
         mel_env_pre) = sample
        rec = OrderedDict()
        rec["stft/avg"] = float(np.mean(stft_d))
        rec["lsd/avg"] = float(np.mean(lsd))
        rec["mse/avg"] = float(np.mean(mse))
        rec["snr/avg"] = float(np.nanmean(snr))
        for i, ch in zip(range(3), "YZX"):
            rec[f"stft/{ch}"] = float(stft_d[i])
            rec[f"lsd/{ch}"] = float(lsd[i])
            rec[f"mse/{ch}"] = float(mse[i])
            rec[f"snr/{ch}"] = float(snr[i])

        if mel_env_pre is not None:
            # computed on-device (--device_metrics), amplitudes included
            mel, env, amp_pred, amp_gt = mel_env_pre
        else:
            mel = compute_mel_lsd(pred, gt, self.cfg.audio_rate)
            env = compute_envelope_dist(pred, gt)
            amp_pred, amp_gt = np.abs(pred).max(), np.abs(gt).max()
        rec["mel_lsd/avg"] = float(np.mean(mel))
        rec["env_mse/avg"] = float(np.mean(env))
        for i, ch in zip(range(3), "YZX"):
            rec[f"mel_lsd/{ch}"] = float(mel[i])
            rec[f"env_mse/{ch}"] = float(env[i])

        if emd_pre is not None:
            emd_dir, emd_dir2 = emd_pre  # solved on-device (emd_mode="sinkhorn")
        else:
            gt_m = np.concatenate([mono, gt], axis=1) * layout[None, :]
            pred_m = np.concatenate([mono, pred], axis=1) * layout[None, :]
            emd_dir, emd_dir2 = ambix_emd(pred_m, gt_m, self.cfg.audio_rate,
                                          ang_res=self.emd_ang_res)
        rec["emd/dir"] = float(emd_dir)
        rec["emd/dir2"] = float(emd_dir2)
        rec["amplitude/gt"] = float(amp_gt)
        rec["amplitude/predicted"] = float(amp_pred)
        return sid, rec

    def run(self, output_fn: str | None = None, host_threads: int = 8,
            print_every: int = 5, max_batches: int | None = None,
            max_inflight: int | None = None, flush_every: int = 64):
        """One eval pass. Memory- and crash-bounded (reference eval.py:210-215
        dumps periodically): at most ``max_inflight`` (default 2x
        host_threads + one batch) per-sample host-metric futures — each
        holding ~100 KB of mono/gt/pred audio — are in flight at once, and
        completed records stream to ``output_fn`` every ``flush_every``
        results, so a crash at sample N loses at most the unflushed tail
        instead of all N rows.
        """
        if output_fn is None:
            # multi-host: each process scores a disjoint shard and must not
            # clobber the others' rows on a shared model_dir — the default
            # filename gains a per-shard suffix (cat the shards, or point
            # sag-parse-eval at each; the returned summary likewise covers
            # only this process's shard).
            suffix = (f".shard{self.shard_id}" if self.num_shards > 1 else "")
            output_fn = os.path.join(self.cfg.model_dir,
                                     "eval-detailed.txt" + suffix)
        if max_inflight is None:
            max_inflight = 2 * host_threads + self.batch_size
        results: list = []
        n_scored = 0
        self.feeder.start()
        t_start = time.time()
        try:
            with open(output_fn, "w") as out, \
                    ThreadPoolExecutor(max_workers=host_threads) as pool:
                out.write("SampleID | {}\n".format(" ".join(ALL_METRICS)))
                from collections import deque

                futures: deque = deque()

                def drain(limit: int):
                    """Retire futures (in submit order) down to `limit`
                    outstanding, then opportunistically retire any further
                    already-done head-of-queue entries."""
                    nonlocal n_scored
                    while futures and (len(futures) > limit or futures[0].done()):
                        sid, rec = futures.popleft().result()
                        results.append((sid, rec))
                        out.write("{} | {}\n".format(
                            sid, " ".join(str(rec[m]) for m in ALL_METRICS)))
                        n_scored += 1
                        if n_scored % flush_every == 0:
                            out.flush()

                for it, batch in enumerate(self.feeder.batches()):
                    if max_batches is not None and it >= max_batches:
                        break
                    padded, n_valid = self._pad(batch)
                    arrays = {k: v for k, v in padded.items() if k != "id"}
                    if self._batch_sharding is not None:
                        arrays = jax.device_put(arrays, self._batch_sharding)
                    pred, mono, target, metrics, per_sample = self.eval_fn(self.state, arrays)
                    emd_batch = spectral_batch = None
                    if self._battery_device_fn is not None:
                        # one packed fetch; the per-sample audio is never
                        # consumed on the host — no ~2 MB prediction fetch
                        pack = np.asarray(self._battery_device_fn(
                            pred, mono, target, arrays["audio_mask"],
                            per_sample["stft"], per_sample["lsd"],
                            per_sample["mse"], per_sample["snr"]))
                        ps = {"stft": pack[:, 0:3], "lsd": pack[:, 3:6],
                              "mse": pack[:, 6:9], "snr": pack[:, 9:12]}
                        spectral_batch = (pack[:, 12:15], pack[:, 15:18],
                                          pack[:, 20], pack[:, 21])
                        emd_batch = (pack[:, 18], pack[:, 19])
                        pred = mono = target = [None] * self.batch_size
                    else:
                        if self._emd_device_fn is not None:
                            d1, d2 = self._emd_device_fn(
                                pred, mono, target, arrays["audio_mask"])
                            emd_batch = (np.asarray(d1), np.asarray(d2))
                        if self._spectral_device_fn is not None:
                            mel, env, amp = self._spectral_device_fn(pred, target)
                            spectral_batch = (np.asarray(mel), np.asarray(env),
                                              np.asarray(amp[0]), np.asarray(amp[1]))
                        pred, mono, target = map(np.asarray, (pred, mono, target))
                        ps = {k: np.asarray(v) for k, v in per_sample.items()}
                    for smp in range(n_valid):
                        sample = (batch["id"][smp], mono[smp], target[smp], pred[smp],
                                  batch["audio_mask"][smp],
                                  ps["stft"][smp] * METRIC_SCALES["stft"],
                                  ps["lsd"][smp],
                                  ps["mse"][smp] * METRIC_SCALES["mse"],
                                  ps["snr"][smp],
                                  None if emd_batch is None else
                                  (float(emd_batch[0][smp]), float(emd_batch[1][smp])),
                                  None if spectral_batch is None else
                                  (spectral_batch[0][smp], spectral_batch[1][smp],
                                   float(spectral_batch[2][smp]),
                                   float(spectral_batch[3][smp])))
                        futures.append(pool.submit(self._host_metrics, sample))
                    drain(max_inflight)
                    if print_every and it % print_every == 0:
                        print(f"eval: batch {it}, {len(futures)} samples in "
                              f"flight, {n_scored} scored, "
                              f"{time.time() - t_start:.1f}s")
                drain(0)
        finally:
            self.feeder.stop()

        summary = {m: float(np.mean([rec[m] for _, rec in results]))
                   for m in ALL_METRICS} if results else {}
        return summary, results
