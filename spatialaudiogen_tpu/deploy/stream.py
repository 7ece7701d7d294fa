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

Multi-session serving: one 0.1 s window keeps a chip busy ~3 ms, so a
single stream uses ~3% of it. StreamBatcher multiplexes up to `capacity`
sessions into ONE batched forward per tick, with a device-resident rolling
context buffer per lane: each tick ships only the NEW 0.1 s of audio per
session (the other 10.9/11 of the window is already in HBM), an 11x H2D
byte cut over re-uploading windows.
"""

from __future__ import annotations

import numpy as np

from spatialaudiogen_tpu.deploy.deploy import MonoToAmbix

FRAMES_FPS = 10.0  # the frames/ layout raw rate (preprocess.py:98-143)


class _SessionState:
    """Host-side bookkeeping for one streaming session: sample/frame
    buffers, window readiness, frame pairing with drop substitution, and
    bounded-memory gc. No device work — StreamingMonoToAmbix couples one of
    these to a batch-1 engine; StreamBatcher couples many to one batched
    engine."""

    def __init__(self, cfg, geometry):
        self.cfg = cfg
        self.geometry = geometry
        rate = cfg.audio_rate
        g = geometry
        self._needs_video = "video" in cfg.encoders
        self._needs_flow = "flow" in cfg.encoders
        # window k emits [t_k, t_k + duration), t_k = context/2 + k*duration
        self._chunk_t = lambda k: cfg.context / 2.0 + k * g.snd_dur / rate
        self._buf = np.zeros((0,), np.float32)   # mono samples
        self._buf_start = 0                      # absolute index of _buf[0]
        self._pushed = 0                         # samples incl. flush padding
        self._pushed_real = 0                    # caller-pushed samples only
        self._frames: dict[int, np.ndarray] = {}
        self._frames_pushed = 0
        # flow frames stream at the same 10 fps cadence as video frames and
        # share the pairing/substitution policy
        self._flows: dict[int, np.ndarray] = {}
        self._flows_pushed = 0
        self.next_window = 0
        # live sources drop frames: once the audio runs `frame_patience_s`
        # past a missing frame's due time, the latest available frame is
        # substituted (the standard repeat-last-frame policy) instead of
        # stalling the stream forever; substitutions are counted per
        # modality (video/flow) so a video+flow session's monitoring can
        # tell which stream dropped; `frames_substituted` is the aggregate.
        self.frame_patience_s = 0.3
        self.video_frames_substituted = 0
        self.flow_frames_substituted = 0

    @property
    def frames_substituted(self) -> int:
        """Total substitutions across modalities (back-compat aggregate)."""
        return self.video_frames_substituted + self.flow_frames_substituted

    # --- input side ---------------------------------------------------
    def push(self, samples: np.ndarray | None, frame: np.ndarray | None,
             flow: np.ndarray | None = None):
        if samples is not None and len(samples) > 0:
            s = np.asarray(samples, np.float32).reshape(-1)
            self._buf = np.concatenate([self._buf, s])
            self._pushed += len(s)
            self._pushed_real += len(s)
        if frame is not None:
            assert self._needs_video, "model without video encoder given a frame"
            assert frame.dtype == np.uint8, "frames stream as uint8"
            # (H, W, 3) RGB or (H*3/2, W) raw I420 planes — the device fn
            # picks the branch by rank; a session must not mix the two.
            # Flow configs assemble windows on host (the host-assembly
            # forward, like batch deploy's flow path): RGB only.
            assert frame.ndim in (2, 3), frame.shape
            assert frame.ndim == 3 or not self._needs_flow, \
                "flow configs take RGB frames (host assembly), not I420"
            if self._frames:
                assert frame.ndim == next(iter(self._frames.values())).ndim, \
                    "mixed RGB/I420 frames within one session"
            self._frames[self._frames_pushed] = frame
            self._frames_pushed += 1
        if flow is not None:
            assert self._needs_flow, "model without flow encoder given flow"
            # (H, W, 3) float (dx, dy, mag) as the model consumes it
            # (FlowFrameReader semantics, reference feeder.py:147-161) — or
            # (H, W, 2) raw (dx, dy) from a live flow estimator, the
            # magnitude channel derived here
            f = np.asarray(flow, np.float32)
            assert f.ndim == 3 and f.shape[-1] in (2, 3), f.shape
            if f.shape[-1] == 2:
                f = np.concatenate(
                    [f, np.hypot(f[..., :1], f[..., 1:2])], axis=-1)
            self._flows[self._flows_pushed] = f
            self._flows_pushed += 1

    # --- window readiness ----------------------------------------------
    def start_sample(self, k: int) -> int:
        return self.geometry.chunk_start_sample(self._chunk_t(k))

    def window_ready(self, k: int) -> bool:
        g = self.geometry
        if self._pushed < self.start_sample(k) + g.snd_size:
            return False
        for store in self._frame_stores():
            for i in self._frame_indices(k):
                if i in store:
                    continue
                # frame i is due at audio time i/10 s; substitute once the
                # audio cadence has run frame_patience_s past it (liveness
                # over exactness for dropped frames), else wait
                due = (i / FRAMES_FPS + self.frame_patience_s) * self.cfg.audio_rate
                if self._pushed < due or not store:
                    return False
        return True

    def _frame_stores(self) -> list:
        """The per-modality 10 fps frame dicts this config streams (video
        and/or flow) — readiness, substitution and gc treat them alike."""
        return ([self._frames] if self._needs_video else []) + \
               ([self._flows] if self._needs_flow else [])

    def next_ready(self) -> bool:
        return self.window_ready(self.next_window)

    def _frame_indices(self, k: int) -> list:
        from spatialaudiogen_tpu.data.readers import raw_frame_indices

        g = self.geometry
        # mirror VideoFrameReader.frame_indices for an unbounded stream:
        # no clamping against a known frame count (live sources grow)
        t = self._chunk_t(k)
        return raw_frame_indices(t, FRAMES_FPS, self.cfg.video_rate, g.vid_dur,
                                 num_frames=1 << 62)

    # --- window contents -------------------------------------------------
    def window_samples(self, k: int) -> np.ndarray:
        """(snd_size,) float32 input window of window k."""
        g = self.geometry
        lo = self.start_sample(k) - self._buf_start
        return self._buf[lo: lo + g.snd_size]

    def window_mono(self, k: int) -> np.ndarray:
        """(snd_dur, 1) mono W passthrough of window k."""
        g = self.geometry
        w = self.window_samples(k)
        return w[g.nosep_ss: g.nosep_ss + g.snd_dur, None].astype(np.float32)

    def window_frames(self, k: int) -> np.ndarray | None:
        """(T, H, W, 3) RGB or (T, H*3/2, W) I420 uint8 frames of window k
        (None for audio-only) — whichever form the session pushes."""
        if not self._needs_video:
            return None
        return self._stack_window(self._frames, k)

    def window_flow(self, k: int) -> np.ndarray | None:
        """(T, H, W, 3) float32 (dx, dy, mag) flow of window k (None unless
        the config has a flow encoder)."""
        if not self._needs_flow:
            return None
        return self._stack_window(self._flows, k)

    def _stack_window(self, store: dict, k: int) -> np.ndarray:
        counter = ("video_frames_substituted" if store is self._frames
                   else "flow_frames_substituted")
        frames = []
        for i in self._frame_indices(k):
            if i not in store:  # dropped frame: repeat the latest
                setattr(self, counter, getattr(self, counter) + 1)
                i = max(store)
            frames.append(store[i])
        return np.stack(frames, 0)

    def advance(self):
        self.next_window += 1
        self._gc()

    # --- end of stream ---------------------------------------------------
    def flush_pending(self) -> bool:
        """True while a window whose OUTPUT lies within the real pushed
        audio has not emitted yet."""
        g = self.geometry
        return (self.start_sample(self.next_window) + g.nosep_ss
                < self._pushed_real)

    def pad_for_flush(self):
        """Zero-pad the future context (and repeat the last frame) so the
        next pending window becomes ready; padding never counts as real
        input, keeping flush idempotent at end of stream."""
        g = self.geometry
        self._buf = np.concatenate([self._buf, np.zeros(g.snd_dur, np.float32)])
        self._pushed += g.snd_dur
        if self._needs_video and self._frames:
            self._frames[self._frames_pushed] = self._frames[max(self._frames)]
            self._frames_pushed += 1
        if self._needs_flow and self._flows:
            self._flows[self._flows_pushed] = self._flows[max(self._flows)]
            self._flows_pushed += 1

    def _gc(self):
        """Drop consumed history: samples/frames earlier than the next
        window's reach (bounded memory for unbounded streams)."""
        g = self.geometry
        keep_from = self.start_sample(self.next_window)
        drop = keep_from - self._buf_start
        if drop > 4 * g.snd_size:  # amortize the copy
            self._buf = self._buf[drop:].copy()
            self._buf_start += drop
        for store in self._frame_stores():
            if not store:
                continue
            # keep the newest frame even when it is older than the next
            # window's range: it is the substitution source for dropped
            # frames (a gc that removed it would stall the stream)
            first_needed = min(self._frame_indices(self.next_window)[0],
                               max(store))
            for i in [i for i in store if i < first_needed]:
                del store[i]


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
        # f16_fetch halves the prediction D2H bytes (see MonoToAmbix).
        # Flow-encoder configs ignore it: their windows run the
        # host-assembly forward (engine.fwd), which — exactly like batch
        # deploy's flow route (_predict_span_host) — always fetches f32;
        # that shared f32 path is what makes the flow stream bit-identical
        # to MonoToAmbix(batch_size=1).deploy().
        self.engine = MonoToAmbix(model_dir, batch_size=1,
                                  compute_dtype=compute_dtype,
                                  yuv_frames=False, f16_fetch=f16_fetch)
        self.cfg = self.engine.cfg
        self.geometry = self.engine.geometry
        # must equal deploy's (B-1)*snd_dur + snd_size + 16 at B=1 so the
        # batch engine's compiled fwd_span executable is shared
        self._span_len = self.geometry.snd_size + 16
        self._session = _SessionState(self.cfg, self.geometry)

    # back-compat introspection used by tests/soaks
    @property
    def frames_substituted(self) -> int:
        return self._session.frames_substituted

    @property
    def video_frames_substituted(self) -> int:
        return self._session.video_frames_substituted

    @property
    def flow_frames_substituted(self) -> int:
        return self._session.flow_frames_substituted

    @property
    def frame_patience_s(self) -> float:
        return self._session.frame_patience_s

    @frame_patience_s.setter
    def frame_patience_s(self, v: float):
        self._session.frame_patience_s = v

    def push(self, samples: np.ndarray | None = None,
             frame: np.ndarray | None = None,
             flow: np.ndarray | None = None) -> list:
        """Feed new mono samples and/or one video/flow frame; returns the
        list of (snd_dur, num_ambi_channels) float32 FOA chunks that became
        computable (possibly empty, possibly several after a large block).

        samples: 1-D float32 mono (any length, including 0).
        frame: (H, W, 3) uint8 RGB — or (H*3/2, W) raw I420 planes, halving
        the frame transport for sources that natively produce 4:2:0 — at
        the training resolution; push one per 0.1 s of audio (the 10 fps
        frames-layout rate), starting at t=0.
        flow (flow-encoder configs): (H, W, 3) float32 (dx, dy, mag) as the
        model consumes it, or (H, W, 2) raw (dx, dy) from a live flow
        estimator (magnitude derived); same 10 fps cadence as frames. Flow
        configs run the host-assembly forward — the same executable as
        batch deploy's flow path (deploy.py _predict_span_host).
        """
        self._session.push(samples, frame, flow)
        return self._drain()

    def _drain(self) -> list:
        out = []
        while self._session.next_ready():
            out.append(self._run_window(self._session.next_window))
            self._session.advance()
        return out

    def _run_window(self, k: int) -> np.ndarray:
        import jax

        g = self.geometry
        s = self._session
        if s._needs_flow:
            # flow configs mirror batch deploy's host-assembly route
            # (deploy.py _predict_span_host): per-window float arrays into
            # engine.fwd — the SAME jitted executable, so the emitted
            # stream is bit-identical to MonoToAmbix(batch_size=1).deploy()
            audio = s.window_samples(k).astype(np.float32)[None, :, None]
            video = s.window_frames(k)
            if video is not None:
                # img_prep_default's f32 arithmetic (readers.py): cast to
                # f32 FIRST, then /255 - 0.5 — bit-identical to the host
                # batch path (f64-then-cast differs by 1 ulp for pixel
                # values 64-191)
                video = (video.astype(np.float32) / 255.0 - 0.5)[None]
            flow = s.window_flow(k)[None]
            out = np.asarray(self.engine.fwd(self.engine.state, audio,
                                             video, flow))
            pred = out.astype(np.float32).reshape(g.snd_dur, -1)
            return np.concatenate([s.window_mono(k), pred], axis=1)
        span = np.zeros((self._span_len, 1), np.float32)
        span[: g.snd_size, 0] = s.window_samples(k)
        rel = np.zeros((1,), np.int32)  # lane 0 valid (rel >= 0)
        frames = s.window_frames(k)
        video_u8 = None if frames is None else frames[None]  # (1, T, H, W, 3)
        parts = self.engine.fwd_span(
            self.engine.state, jax.device_put(span), rel, video_u8)
        # fwd_span returns sub-cliff fetch parts; at batch 1 (28 KB) that is
        # a single part, but concatenate keeps this correct for any engine
        pred = np.concatenate([np.asarray(p) for p in parts])
        pred = pred.astype(np.float32).reshape(g.snd_dur, -1)
        return np.concatenate([s.window_mono(k), pred], axis=1)

    def flush(self) -> list:
        """End of stream: zero-pad the future context so every window whose
        OUTPUT lies within the pushed audio still emits (the batch engine
        zero-pads past clip end the same way, audio_window_bounds). Video
        models repeat the last pushed frame. Returns the remaining chunks.
        """
        s = self._session
        assert not (s.flush_pending() and s._needs_video and not s._frames), \
            "flush() of a video model needs at least one pushed frame"
        assert not (s.flush_pending() and s._needs_flow and not s._flows), \
            "flush() of a flow model needs at least one pushed flow frame"
        out = []
        while s.flush_pending():
            s.pad_for_flush()
            out += self._drain()
        return out

    @property
    def algorithmic_latency_s(self) -> float:
        """Seconds of future input required past an emitted chunk's end."""
        g = self.geometry
        s = self._session
        need = s.start_sample(0) + g.snd_size
        end = s.start_sample(0) + g.nosep_ss + g.snd_dur
        return (need - end) / self.cfg.audio_rate


class StreamBatcher:
    """Multiplex up to `capacity` streaming sessions into ONE batched
    forward per tick — the serving-side completion of the reference's
    deploy batching idea (deploy.py:112-148), applied across sessions
    instead of across one clip's windows.

    Design (TPU-first): each session owns a lane of a device-resident
    (capacity, snd_size) rolling context buffer. Consecutive windows of a
    session overlap by 10/11, so a tick ships only the NEW snd_dur samples
    per emitting lane and the buffer rolls on device inside the same jitted
    program as the forward — one H2D (chunks), one dispatch, one sub-cliff
    D2H per round, whatever the session count. Sessions join/leave between
    ticks; joining uploads the lane's first full window once.

    Parity: for audio-only models every lane is mathematically independent
    (the audio path's BatchNorm uses running averages at eval), and
    tests/test_stream.py pins bit-equality against N independent
    StreamingMonoToAmbix sessions. For video models the reference's
    batch-statistics BatchNorm quirk couples lanes exactly like the batch
    deploy engine couples windows — batched serving then matches
    MonoToAmbix's batch semantics, NOT N isolated batch-1 streams.
    """

    def __init__(self, model_dir: str, capacity: int = 16,
                 compute_dtype: str | None = None, f16_fetch: bool = True,
                 mesh=None):
        import jax
        import jax.numpy as jnp

        self.engine = MonoToAmbix(model_dir, batch_size=capacity, mesh=mesh,
                                  compute_dtype=compute_dtype,
                                  yuv_frames=False, f16_fetch=f16_fetch)
        self.cfg = self.engine.cfg
        self.geometry = self.engine.geometry
        self.capacity = capacity
        g = self.geometry
        self._needs_video = "video" in self.cfg.encoders
        assert "flow" not in self.cfg.encoders, \
            "batched serving of flow configs is not wired (flow windows " \
            "are float host-assembled arrays, deploy.py " \
            "_predict_span_host); serve them via StreamingMonoToAmbix"
        self._sessions: dict[int, _SessionState] = {}
        self._lane_of: dict[int, int] = {}
        self._warm: dict[int, bool] = {}   # lane buffer holds a valid window
        self._consumed: dict[int, int] = {}  # absolute sample index shipped
        self._next_sid = 0
        self._free_lanes = list(range(capacity))
        # multi-chip serving: with a ('data','model') mesh the lane axis of
        # the rolling buffer — and every per-tick batch input/output —
        # shards over the data axis, so `capacity` sessions spread across
        # chips with the per-tick H2D/D2H split the same way. Audio-only
        # lanes are mathematically independent, so sharding adds zero
        # collectives; video models all-reduce the batch-stats BatchNorm
        # moments exactly like the sharded batch deploy does.
        self.mesh = mesh
        bshd = rshd = None
        if mesh is not None:
            from spatialaudiogen_tpu.parallel.mesh import (
                DATA_AXIS, batch_sharding, replicated)

            n_data = mesh.shape[DATA_AXIS]
            assert capacity % n_data == 0, \
                f"capacity {capacity} must divide over data axis {n_data}"
            bshd, rshd = batch_sharding(mesh), replicated(mesh)
            self._buf = jax.device_put(
                np.zeros((capacity, g.snd_size), np.float32), bshd)
        else:
            self._buf = jnp.zeros((capacity, g.snd_size), jnp.float32)

        snd_dur, snd_size = g.snd_dur, g.snd_size
        fwd = self.engine.fwd

        def set_lane(buf, lane, window):
            return jax.lax.dynamic_update_slice(buf, window[None], (lane, 0))

        if mesh is None:
            self._set_lane = jax.jit(set_lane, donate_argnums=(0,))
        else:
            self._set_lane = jax.jit(set_lane, donate_argnums=(0,),
                                     in_shardings=(bshd, rshd, rshd),
                                     out_shardings=bshd)

        def tick_fn(state, buf, chunk, do_shift, valid, video_u8):
            """Roll emitting lanes by snd_dur and run the batched forward.

            buf (C, snd_size) f32 rolling contexts; chunk (C, snd_dur) f32
            new samples (zeros for non-shifting lanes); do_shift/valid (C,)
            f32 masks. Pad/non-emitting lanes are zeroed into the forward —
            the same convention as the batch deploy's padded tail lanes.
            """
            shifted = jnp.concatenate([buf[:, snd_dur:], chunk], axis=1)
            new_buf = jnp.where(do_shift[:, None] > 0, shifted, buf)
            audio = (new_buf * valid[:, None])[..., None]  # (C, snd_size, 1)
            video = None
            if video_u8 is not None:
                if video_u8.ndim == 4:  # (C, T, H*3/2, W) raw I420 planes
                    # live sources natively produce 4:2:0; shipping planes
                    # halves the dominant per-tick H2D (same device
                    # conversion as the batch engine's yuv_frames path)
                    from spatialaudiogen_tpu.deploy.deploy import (
                        yuv420_planes_to_rgb01)

                    h = video_u8.shape[2] * 2 // 3
                    video = yuv420_planes_to_rgb01(video_u8, h) - 0.5
                else:
                    video = video_u8.astype(jnp.float32) / 255.0 - 0.5
                video = video * valid[:, None, None, None, None]
            out = fwd(state, audio, video, None)
            if f16_fetch:
                out = out.astype(jnp.float16)
            return new_buf, out

        if mesh is None:
            self._tick_fn = jax.jit(tick_fn, donate_argnums=(1,))
        else:
            # state replicated (the engine already placed it), every batch
            # input/output sharded over the data axis; sharding specs are
            # prefix-broadcast over video_u8=None for audio-only models
            self._tick_fn = jax.jit(
                tick_fn, donate_argnums=(1,),
                in_shardings=(rshd, bshd, bshd, bshd, bshd, bshd),
                out_shardings=(bshd, bshd))

    # --- session management -------------------------------------------
    def add_session(self) -> int:
        assert self._free_lanes, f"at capacity ({self.capacity} sessions)"
        sid = self._next_sid
        self._next_sid += 1
        lane = self._free_lanes.pop(0)
        self._sessions[sid] = _SessionState(self.cfg, self.geometry)
        self._lane_of[sid] = lane
        self._warm[sid] = False
        self._consumed[sid] = 0
        return sid

    def remove_session(self, sid: int):
        lane = self._lane_of.pop(sid)
        del self._sessions[sid], self._warm[sid], self._consumed[sid]
        self._free_lanes.append(lane)
        # zero the stale lane so video-model batch statistics see the same
        # zeros an empty deploy pad lane would contribute
        self._buf = self._set_lane(
            self._buf, lane, np.zeros(self.geometry.snd_size, np.float32))

    @property
    def n_sessions(self) -> int:
        return len(self._sessions)

    def push(self, sid: int, samples: np.ndarray | None = None,
             frame: np.ndarray | None = None):
        """Buffer input for session `sid`; compute happens at tick()."""
        self._sessions[sid].push(samples, frame)

    # --- the batched tick ------------------------------------------------
    def tick(self, max_rounds: int | None = None) -> dict:
        """Run batched forwards until no session has a ready window (or
        max_rounds). Returns {sid: [(snd_dur, 1+n_out) chunks...]} for
        sessions that emitted."""
        g = self.geometry
        out: dict[int, list] = {}
        rounds = 0
        while max_rounds is None or rounds < max_rounds:
            emitting = [(sid, s) for sid, s in self._sessions.items()
                        if s.next_ready()]
            if not emitting:
                break
            rounds += 1
            chunk = np.zeros((self.capacity, g.snd_dur), np.float32)
            do_shift = np.zeros((self.capacity,), np.float32)
            valid = np.zeros((self.capacity,), np.float32)
            lane_frames: dict[int, np.ndarray] = {}
            metas = []
            for sid, s in emitting:
                lane = self._lane_of[sid]
                k = s.next_window
                s0 = s.start_sample(k)
                if not self._warm[sid]:
                    # one-time full-window upload for a fresh lane
                    self._buf = self._set_lane(
                        self._buf, lane, np.ascontiguousarray(
                            s.window_samples(k), dtype=np.float32))
                    self._warm[sid] = True
                else:
                    # rolling update: ship only the new snd_dur samples
                    # [consumed, consumed + snd_dur) — windows advance by
                    # exactly snd_dur (chunk_start_sample rounds k*0.1 s to
                    # the sample grid; exact for any realistic stream length)
                    assert s0 + g.snd_size == self._consumed[sid] + g.snd_dur, \
                        "window cadence drifted off snd_dur"
                    lo = self._consumed[sid] - s._buf_start
                    chunk[lane] = s._buf[lo: lo + g.snd_dur]
                    do_shift[lane] = 1.0
                valid[lane] = 1.0
                self._consumed[sid] = s0 + g.snd_size
                if self._needs_video:
                    lane_frames[lane] = s.window_frames(k)
                metas.append((sid, lane, s.window_mono(k)))
                s.advance()
            video_u8 = None
            if self._needs_video:
                # frame form is whatever the sessions push — (T, H, W, 3)
                # RGB or (T, H*3/2, W) I420 planes (tick_fn branches on the
                # rank); one batcher must see ONE form (each form is its
                # own compiled executable, and mixed lanes can't stack)
                shapes = {f.shape for f in lane_frames.values()}
                assert len(shapes) == 1, \
                    f"mixed frame forms across sessions: {shapes}"
                video_u8 = np.zeros((self.capacity,) + shapes.pop(),
                                    np.uint8)
                for lane, f in lane_frames.items():
                    video_u8[lane] = f
            self._buf, dev_out = self._tick_fn(
                self.engine.state, self._buf, chunk, do_shift, valid,
                video_u8)
            host = np.asarray(dev_out).astype(np.float32)
            for sid, lane, mono in metas:
                chunkout = np.concatenate([mono, host[lane]], axis=1)
                out.setdefault(sid, []).append(chunkout)
        return out

    def flush(self, sid: int) -> dict:
        """End-of-stream for one session: pad its future context until all
        its real-audio windows emitted (other sessions may ride along in
        the same rounds). Returns the same {sid: chunks} dict as tick()."""
        s = self._sessions[sid]
        assert not (s.flush_pending() and s._needs_video and not s._frames), \
            "flush() of a video model needs at least one pushed frame"
        merged: dict[int, list] = {}
        while s.flush_pending():
            s.pad_for_flush()
            for k, v in self.tick().items():
                merged.setdefault(k, []).extend(v)
        return merged
