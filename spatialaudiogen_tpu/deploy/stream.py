"""Streaming mono->FOA serving: incremental windows with fixed latency.

The batch engine (deploy.MonoToAmbix, reference deploy.py:90-152) needs the
whole clip on disk; this wraps the same compiled forward in a push API for
live sources: feed mono samples (and 10 fps frames for video models) as they
arrive, and each 0.1 s FOA chunk is emitted as soon as its input window is
complete. No reference analogue — this is the serving-path addition the
batch design makes cheap: one window is just a batch-1 span with rel=[0].

Latency model (48 kHz, context 1.0 s, duration 0.1 s):
  * algorithmic: the window for output [t, t+0.1) spans
    [t-0.5, t+0.6) (geometry.chunk_start_sample), so the model needs 0.5 s
    of FUTURE context beyond the emitted chunk's end — inherent to the
    reference architecture, not this wrapper;
  * compute: one batch-1 forward + H2D/D2H (measured in PERF.md).

Exactness: the emitted stream is bit-identical to
MonoToAmbix(batch_size=1).deploy() over the same samples (same jitted
fwd_span executable, same window arithmetic; pinned in
tests/test_stream.py) — including the BatchNorm batch-statistics quirk,
which batch-1 serving sidesteps entirely (each window sees only itself).
"""

from __future__ import annotations

import numpy as np

from spatialaudiogen_tpu.deploy.deploy import MonoToAmbix


class StreamingMonoToAmbix:
    """Push-based wrapper over the batch-1 deploy forward.

    Usage:
        stream = StreamingMonoToAmbix(model_dir)
        for block, frame in source:            # any block sizes; frames at
            for foa in stream.push(block, frame):   # video_rate if needed
                sink(foa)                       # (snd_dur, 4) W+YZX chunks

    Video models: push frames in display order at the frames-layout raw
    rate (10 fps — one frame per 0.1 s of audio), starting at t=0; the
    engine then pairs frames with windows exactly like
    VideoFrameReader.frame_indices (subsampling when the model's
    video_rate is below 10).
    """

    def __init__(self, model_dir: str, compute_dtype: str | None = None,
                 f16_fetch: bool = True):
        self.engine = MonoToAmbix(model_dir, batch_size=1,
                                  compute_dtype=compute_dtype,
                                  yuv_frames=False, f16_fetch=f16_fetch)
        self.cfg = self.engine.cfg
        g = self.engine.geometry
        self.geometry = g
        rate = self.cfg.audio_rate
        self._needs_video = "video" in self.cfg.encoders
        assert "flow" not in self.cfg.encoders, \
            "streaming flow input is not wired up (push precomputed flow " \
            "frames is a straightforward extension)"
        # window k emits [t_k, t_k + duration), t_k = context/2 + k*duration
        self._chunk_t = lambda k: self.cfg.context / 2.0 + k * g.snd_dur / rate
        # must equal deploy's (B-1)*snd_dur + snd_size + 16 at B=1 so the
        # batch engine's compiled fwd_span executable is shared
        self._span_len = g.snd_size + 16
        self._buf = np.zeros((0,), np.float32)   # mono samples
        self._buf_start = 0                      # absolute index of _buf[0]
        self._pushed = 0                         # samples incl. flush padding
        self._pushed_real = 0                    # caller-pushed samples only
        self._frames: dict[int, np.ndarray] = {}
        self._frames_pushed = 0
        self._next_window = 0
        # live sources drop frames: once the audio runs `frame_patience_s`
        # past a missing frame's due time, the latest available frame is
        # substituted (the standard repeat-last-frame policy) instead of
        # stalling the stream forever; `frames_substituted` counts it.
        self.frame_patience_s = 0.3
        self.frames_substituted = 0

    def _window_ready(self, k: int) -> bool:
        g = self.geometry
        s0 = g.chunk_start_sample(self._chunk_t(k))
        if self._pushed < s0 + g.snd_size:
            return False
        if self._needs_video:
            for i in self._frame_indices(k):
                if i in self._frames:
                    continue
                # frame i is due at audio time i/10 s; substitute once the
                # audio cadence has run frame_patience_s past it (liveness
                # over exactness for dropped frames), else wait
                due = (i / 10.0 + self.frame_patience_s) * self.cfg.audio_rate
                if self._pushed < due or not self._frames:
                    return False
        return True

    def _frame_indices(self, k: int) -> list:
        from spatialaudiogen_tpu.data.readers import raw_frame_indices

        g = self.geometry
        # mirror VideoFrameReader.frame_indices for an unbounded stream:
        # no clamping against a known frame count (live sources grow)
        t = self._chunk_t(k)
        return raw_frame_indices(t, 10.0, self.cfg.video_rate, g.vid_dur,
                                 num_frames=1 << 62)

    def push(self, samples: np.ndarray | None = None,
             frame: np.ndarray | None = None) -> list:
        """Feed new mono samples and/or one video frame; returns the list of
        (snd_dur, num_ambi_channels) float32 FOA chunks that became
        computable (possibly empty, possibly several after a large block).

        samples: 1-D float32 mono (any length, including 0).
        frame: (H, W, 3) uint8 RGB at the training resolution; push one per
        0.1 s of audio (the 10 fps frames-layout rate), starting at t=0.
        """
        if samples is not None and len(samples) > 0:
            s = np.asarray(samples, np.float32).reshape(-1)
            self._buf = np.concatenate([self._buf, s])
            self._pushed += len(s)
            self._pushed_real += len(s)
        if frame is not None:
            assert self._needs_video, "audio-only model given a frame"
            assert frame.dtype == np.uint8, "frames stream as uint8"
            self._frames[self._frames_pushed] = frame
            self._frames_pushed += 1
        return self._drain()

    def _drain(self) -> list:
        out = []
        while self._window_ready(self._next_window):
            out.append(self._run_window(self._next_window))
            self._next_window += 1
            self._gc()
        return out

    def _run_window(self, k: int) -> np.ndarray:
        import jax

        g = self.geometry
        s0 = g.chunk_start_sample(self._chunk_t(k))
        lo = s0 - self._buf_start
        span = np.zeros((self._span_len, 1), np.float32)
        span[: g.snd_size, 0] = self._buf[lo: lo + g.snd_size]
        rel = np.zeros((1,), np.int32)
        valid = np.ones((1,), np.float32)
        video_u8 = None
        if self._needs_video:
            frames = []
            for i in self._frame_indices(k):
                if i not in self._frames:  # dropped frame: repeat the latest
                    self.frames_substituted += 1
                    i = max(self._frames)
                frames.append(self._frames[i])
            video_u8 = np.stack(frames, 0)[None]  # (1, T, H, W, 3)
        pred = np.asarray(self.engine.fwd_span(
            self.engine.state, jax.device_put(span), rel, valid, video_u8))
        pred = pred.astype(np.float32).reshape(g.snd_dur, -1)
        mono = span[g.nosep_ss: g.nosep_ss + g.snd_dur]
        return np.concatenate([mono, pred], axis=1)

    def flush(self) -> list:
        """End of stream: zero-pad the future context so every window whose
        OUTPUT lies within the pushed audio still emits (the batch engine
        zero-pads past clip end the same way, audio_window_bounds). Video
        models repeat the last pushed frame. Returns the remaining chunks.
        """
        g = self.geometry
        end = self._pushed_real  # padding from a previous flush never
        # extends the output range — flush is idempotent at end of stream
        last_frame = (self._frames[max(self._frames)]
                      if self._needs_video and self._frames else None)
        pending = (g.chunk_start_sample(self._chunk_t(self._next_window))
                   + g.nosep_ss) < end
        assert not (pending and self._needs_video and last_frame is None), \
            "flush() of a video model needs at least one pushed frame"
        out = []
        pad = np.zeros(g.snd_dur, np.float32)
        while (g.chunk_start_sample(self._chunk_t(self._next_window))
               + g.nosep_ss) < end:
            self._buf = np.concatenate([self._buf, pad])
            self._pushed += len(pad)  # readiness only, not real input
            if last_frame is not None:
                self._frames[self._frames_pushed] = last_frame
                self._frames_pushed += 1
            out += self._drain()
        return out

    def _gc(self):
        """Drop consumed history: samples/frames earlier than the next
        window's reach (bounded memory for unbounded streams)."""
        g = self.geometry
        keep_from = g.chunk_start_sample(self._chunk_t(self._next_window))
        drop = keep_from - self._buf_start
        if drop > 4 * g.snd_size:  # amortize the copy
            self._buf = self._buf[drop:].copy()
            self._buf_start += drop
        if self._needs_video and self._frames:
            # keep the newest frame even when it is older than the next
            # window's range: it is the substitution source for dropped
            # frames (a gc that removed it would stall the stream)
            first_needed = min(self._frame_indices(self._next_window)[0],
                               max(self._frames))
            for i in [i for i in self._frames if i < first_needed]:
                del self._frames[i]

    @property
    def algorithmic_latency_s(self) -> float:
        """Seconds of future input required past an emitted chunk's end."""
        g = self.geometry
        t0 = self._chunk_t(0)
        need = g.chunk_start_sample(t0) + g.snd_size
        end = g.chunk_start_sample(t0) + g.nosep_ss + g.snd_dur
        return (need - end) / self.cfg.audio_rate
