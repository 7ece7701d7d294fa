"""Full-video mono->FOA inference by batched sliding windows.

Parity with reference deploy.py:41-152 (W2XYZ): the model predicts 0.1 s of
Y/Z/X per window given 1 s of mono context (+ frames); windows slide at 0.1 s
and are batched; the mono W channel passes through untouched. TPU-minded
upgrades:
  * batch size is configurable (default 32 vs the reference's 10) and the
    window batches ride a double-buffered device prefetch;
  * optional Hann crossfade between half-offset passes — completing the
    stitching experiment the reference left commented out (deploy.py:163-180)
    — removes the butt-join seams at window boundaries.
"""

from __future__ import annotations

import os

import jax
import numpy as np

from spatialaudiogen_tpu.config import TrainConfig
from spatialaudiogen_tpu.data.readers import SampleReader, img_prep_default
from spatialaudiogen_tpu.models import SptAudioGen
from spatialaudiogen_tpu.train.checkpoint import restore_checkpoint
from spatialaudiogen_tpu.train.lr import make_optimizer
from spatialaudiogen_tpu.train.state import create_train_state

DEPLOY_DURATION = 0.1  # deploy.py:49


class MonoToAmbix:
    def __init__(self, model_dir: str, batch_size: int = 32):
        self.cfg = TrainConfig.load(model_dir)
        self.cfg.model_dir = model_dir
        self.cfg.sample_dur = DEPLOY_DURATION
        self.batch_size = batch_size
        self.model = SptAudioGen(self.cfg.model_config())
        self.geometry = self.cfg.model_config().geometry

        tx = make_optimizer()
        g = self.geometry
        example = {"ambix": np.zeros((1, g.snd_size, g.num_ambi_channels), np.float32),
                   "audio_mask": np.ones((1, g.num_ambi_channels), np.float32)}
        hw = tuple(self.cfg.frame_hw)
        if "video" in self.cfg.encoders:
            example["video"] = np.zeros((1, g.vid_dur) + hw + (3,), np.float32)
        if "flow" in self.cfg.encoders:
            example["flow"] = np.zeros((1, g.vid_dur) + hw + (3,), np.float32)
        state = create_train_state(self.model, tx, jax.random.PRNGKey(0), example)
        self.state, step = restore_checkpoint(model_dir, state)
        assert step is not None, f"no checkpoint in {model_dir}"
        self.restored_step = step

        def fwd(state, audio, video, flow):
            variables = {"params": state.params}
            if state.batch_stats:
                variables["batch_stats"] = state.batch_stats
            return self.model.apply(variables, audio, video, flow, train=False)

        self.fwd = jax.jit(fwd)

    # ------------------------------------------------------------------
    def _reader(self, input_folder: str, start: float, duration: float | None):
        reader = SampleReader(
            input_folder,
            ambi_order=self.cfg.ambi_order,
            audio_rate=self.cfg.audio_rate,
            video_rate=self.cfg.video_rate,
            context=self.cfg.context,
            duration=DEPLOY_DURATION,
            return_video="video" in self.cfg.encoders,
            img_prep=img_prep_default,
            return_flow="flow" in self.cfg.encoders,
            skip_silence_thr=None,
            shuffle=False,
            random_rotations=False,
            skip_rate=None,
            start_time=start,
            sample_duration=duration,
            rng=np.random.RandomState(0))
        # align the first window exactly to `start` (deploy.py:106-107)
        if reader.chunks_t:
            dt = reader.chunks_t[0] - start
            reader.chunks_t = [t - dt for t in reader.chunks_t]
        return reader

    def _window_batches(self, reader):
        """Host-side batch assembly (runs in a background thread so window
        reads overlap device compute)."""
        g = self.geometry
        batch_ambix, batch_video, batch_flow = [], [], []

        def assemble():
            n = len(batch_ambix)
            ambix = np.stack(batch_ambix, 0).astype(np.float32)
            pad = self.batch_size - n

            def padded(stack):
                arr = np.stack(stack, 0).astype(np.float32)
                if pad:
                    arr = np.concatenate(
                        [arr, np.zeros((pad,) + arr.shape[1:], np.float32)], 0)
                return arr

            if pad:
                ambix = np.concatenate(
                    [ambix, np.zeros((pad,) + ambix.shape[1:], np.float32)], 0)
            video = padded(batch_video) if batch_video else None
            flow = padded(batch_flow) if batch_flow else None
            mono = ambix[:n, g.nosep_ss: g.nosep_ss + g.snd_dur, :1] \
                .reshape(n * g.snd_dur, 1).copy()
            out = (n, ambix, video, flow, mono)
            batch_ambix.clear()
            batch_video.clear()
            batch_flow.clear()
            return out

        for chunk in reader.loop_chunks():
            batch_ambix.append(chunk["ambix"])
            if "video" in chunk:
                batch_video.append(chunk["video"])
            if "flow" in chunk:
                batch_flow.append(chunk["flow"])
            if len(batch_ambix) == self.batch_size:
                yield assemble()
        if batch_ambix:
            yield assemble()

    def _predict_span(self, input_folder: str, start: float, duration: float | None):
        """One sliding pass -> (mono (T,1), pred (T, n_out))."""
        from spatialaudiogen_tpu.data.generic import BackgroundGenerator

        g = self.geometry
        n_in = g.num_in_channels
        reader = self._reader(input_folder, start, duration)
        monos, preds = [], []
        pending = []  # (n, device_out) — fetch lags dispatch by one batch

        def drain(entry):
            n, out = entry
            preds.append(np.asarray(out)[:n].reshape(n * g.snd_dur, -1))

        for n, ambix, video, flow, mono in BackgroundGenerator(
                self._window_batches(reader), depth=2):
            monos.append(mono)
            out = self.fwd(self.state, ambix[:, :, :n_in], video, flow)
            pending.append((n, out))
            if len(pending) > 1:
                drain(pending.pop(0))
        for entry in pending:
            drain(entry)
        if not preds:
            raise ValueError(f"no windows to deploy in {input_folder}")
        return np.concatenate(monos, 0), np.concatenate(preds, 0)

    def deploy(self, input_folder: str, deploy_start: float = 0.0,
               deploy_duration: float | None = 10.0,
               crossfade: bool = False) -> np.ndarray:
        """Returns (T, 1 + n_out) ambisonics: mono W + predicted channels."""
        g = self.geometry
        mono, pred = self._predict_span(input_folder, deploy_start, deploy_duration)
        if crossfade:
            # second pass offset by half a window, Hann-blended
            half = DEPLOY_DURATION / 2.0
            mono2, pred2 = self._predict_span(
                input_folder, deploy_start + half, deploy_duration)
            win = np.hanning(g.snd_dur)[:, None]
            t = min(pred.shape[0], pred2.shape[0] + g.snd_dur // 2)
            h1 = np.tile(win, (pred.shape[0] // g.snd_dur, 1))[:t]
            blended = pred[:t] * h1
            weight = h1.copy()
            off = g.snd_dur // 2
            h2 = np.tile(win, (pred2.shape[0] // g.snd_dur, 1))
            n2 = min(pred2.shape[0], t - off)
            blended[off: off + n2] += pred2[:n2] * h2[:n2]
            weight[off: off + n2] += h2[:n2]
            pred = blended / np.maximum(weight, 1e-3)
            mono = mono[:t]
        return np.concatenate([mono, pred], axis=1)
