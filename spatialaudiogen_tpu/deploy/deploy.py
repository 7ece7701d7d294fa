"""Full-video mono->FOA inference by batched sliding windows.

Parity with reference deploy.py:41-152 (W2XYZ): the model predicts 0.1 s of
Y/Z/X per window given 1 s of mono context (+ frames); windows slide at 0.1 s
and are batched; the mono W channel passes through untouched. TPU-minded
upgrades:
  * batch size is configurable (default 32 vs the reference's 10) and the
    window batches ride a double-buffered device prefetch;
  * **on-device window extraction**: consecutive windows overlap by 10/11
    of their samples, so instead of uploading each 1.1 s window separately
    the host ships one contiguous audio span per batch plus int32 window
    offsets, and the windows are gathered inside the jitted forward.
    Frames ride up as uint8 and are normalized on device. Cuts host->device
    traffic ~4x (the tunnel hop is 40 ms/transfer on the bench host).
    Decode runs in a background thread; all tunnel RPCs stay on one thread
    with the prediction fetch lagging dispatch by two batches — measured
    5x faster than multi-threaded RPC issue on the tunnel (see
    _predict_span_ondevice);
  * optional Hann crossfade between half-offset passes — completing the
    stitching experiment the reference left commented out (deploy.py:163-180)
    — removes the butt-join seams at window boundaries;
  * **multi-chip window sharding**: pass a ('data', 'model') mesh and each
    window batch shards across the data axis (windows are embarrassingly
    parallel, SURVEY §7) — GSPMD partitions the jitted forward, including a
    cross-device mean for the eval-time batch-statistics BatchNorm quirk, so
    outputs match the single-chip path to float tolerance (the all-reduce
    reorders the moment sums; measured ~4e-6 max abs difference).
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


def _triangle_up2(c, axis: int):
    """2x upsample along `axis` with libjpeg's "fancy" (3,1)/4 triangle
    filter, edge-replicated (jdsample.c h2v2_fancy_upsample semantics)."""
    import jax.numpy as jnp

    axis = axis % c.ndim
    n = c.shape[axis]
    first = jnp.take(c, jnp.arange(1), axis=axis)
    last = jnp.take(c, jnp.arange(n - 1, n), axis=axis)
    prev = jnp.concatenate([first, jnp.take(c, jnp.arange(n - 1), axis=axis)], axis)
    nxt = jnp.concatenate([jnp.take(c, jnp.arange(1, n), axis=axis), last], axis)
    st = jnp.stack([(3.0 * c + prev) * 0.25, (3.0 * c + nxt) * 0.25],
                   axis=axis + 1)
    shape = list(c.shape)
    shape[axis] *= 2
    return st.reshape(shape)


def yuv420_planes_to_rgb01(planes, height: int):
    """(..., H*3/2, W) uint8 I420 planes -> (..., H, W, 3) float RGB in
    [0, 1]. Chroma upsampled with the triangle filter and converted with
    libjpeg's BT.601 full-range coefficients (jdcolor.c), so the result
    matches the RGB decode path to ~1.4/255 (jpg fixed-point rounding)."""
    import jax.numpy as jnp

    h = height
    w = planes.shape[-1]
    y = planes[..., :h, :].astype(jnp.float32)
    u = planes[..., h:h + h // 4, :].reshape(planes.shape[:-2] + (h // 2, w // 2))
    v = planes[..., h + h // 4:, :].reshape(planes.shape[:-2] + (h // 2, w // 2))
    u = _triangle_up2(_triangle_up2(u.astype(jnp.float32), -2), -1) - 128.0
    v = _triangle_up2(_triangle_up2(v.astype(jnp.float32), -2), -1) - 128.0
    r = y + 1.402 * v
    g = y - 0.344136 * u - 0.714136 * v
    b = y + 1.772 * u
    return jnp.clip(jnp.stack([r, g, b], axis=-1), 0.0, 255.0) / 255.0


def host_rgb_to_i420(rgb: np.ndarray) -> np.ndarray:
    """(T, H, W, 3) uint8 -> (T, H*3/2, W) uint8 I420 (BT.601 full range,
    2x2 box chroma). Emergency host fallback for frame dirs whose jpgs are
    not 4:2:0; the native raw-plane decode is the fast path."""
    t, h, w, _ = rgb.shape
    f = rgb.astype(np.float32)
    r, g, b = f[..., 0], f[..., 1], f[..., 2]
    y = 0.299 * r + 0.587 * g + 0.114 * b
    u = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
    v = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
    out = np.empty((t, h * 3 // 2, w), np.uint8)
    out[:, :h] = np.clip(y + 0.5, 0, 255)
    for plane, dst0 in ((u, h), (v, h + h // 4)):
        sub = plane.reshape(t, h // 2, 2, w // 2, 2).mean(axis=(2, 4))
        out[:, dst0: dst0 + h // 4] = np.clip(
            sub + 0.5, 0, 255).reshape(t, h // 4, w)
    return out


class MonoToAmbix:
    """Sliding-window deploy engine (reference W2XYZ, deploy.py:41-152).

    Parity caveat: the model evaluates BatchNorm on *batch* statistics (a
    reference quirk, see models/resnet.py), so predictions depend slightly
    on batch composition — including batch_size and the zero-padded tail
    batch, exactly as in the reference (which used batch_size=10). Pass
    batch_size=10 to reproduce the reference's numbers bit-for-bit.
    """

    def __init__(self, model_dir: str, batch_size: int = 32, mesh=None,
                 compute_dtype: str | None = None,
                 yuv_frames: bool | None = None,
                 f16_fetch: bool = True,
                 d2h_chunk_bytes: int = 8 << 20):
        # yuv_frames: ship frames as raw 4:2:0 planes (HALF the RGB888
        # bytes over the H2D link) and convert to RGB on device. None =
        # auto (on when the native raw decoder supports the frame dir);
        # False forces the byte-exact RGB path. The YUV path matches RGB
        # frames to ~1.4/255 (jpg fixed-point rounding; see
        # yuv420_planes_to_rgb01) — inaudible on predictions; flip it off
        # for bit-parity work.
        self.yuv_frames = yuv_frames
        # f16_fetch: cast predictions to float16 on device before the D2H
        # fetch — halves the dominant return-path bytes. The transport
        # error (~5e-4 relative) sits ~-76 dBFS on typical levels, under
        # any listening threshold though ~4 bits above PCM16's floor;
        # False restores the f32-exact fetch for parity work. Baked into
        # the jitted fwd_span at construction — mutating the attribute
        # afterwards has no effect (jit caches the traced closure).
        self.f16_fetch = f16_fetch
        # d2h_chunk_bytes: the tunnel's D2H throughput falls off a cliff on
        # single transfers >11 MB (PERF.md batch A/B: 384-window f16
        # prediction fetches are ~11.1 MB and ride it). fwd_span therefore
        # returns the flat prediction split into ceil(bytes/chunk) parts —
        # separate outputs of the SAME compiled program, so chunking adds
        # zero device dispatches — and the drain fetches them sequentially
        # on the one RPC thread, each a sub-cliff transfer.
        self.d2h_chunk_bytes = int(d2h_chunk_bytes)
        self.cfg = TrainConfig.load(model_dir, compute_dtype=compute_dtype)
        self.cfg.model_dir = model_dir
        self.cfg.sample_dur = DEPLOY_DURATION
        self.batch_size = batch_size
        self.mesh = mesh
        self._batch_shd = self._rep_shd = None
        if mesh is not None:
            from spatialaudiogen_tpu.parallel.mesh import (
                DATA_AXIS, batch_sharding, replicated)

            n_data = mesh.shape[DATA_AXIS]
            assert batch_size % n_data == 0, \
                f"batch_size {batch_size} must divide over data axis {n_data}"
            self._batch_shd = batch_sharding(mesh)
            self._rep_shd = replicated(mesh)
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
        if mesh is not None:
            self.state = jax.device_put(self.state, self._rep_shd)

        def fwd(state, audio, video, flow):
            variables = {"params": state.params}
            if state.batch_stats:
                variables["batch_stats"] = state.batch_stats
            return self.model.apply(variables, audio, video, flow, train=False)

        self.fwd = jax.jit(fwd)

        snd_size = g.snd_size
        # static fetch-chunk geometry (model output is (B, snd_dur, n_out))
        n_out = g.num_ambi_channels - g.num_in_channels
        out_elems = batch_size * g.snd_dur * n_out
        out_bytes = out_elems * (2 if f16_fetch else 4)
        n_parts = max(1, -(-out_bytes // self.d2h_chunk_bytes))
        part_elems = -(-out_elems // n_parts)
        self._n_out = n_out

        def fwd_span(state, span, rel, video_u8):
            """Forward over windows gathered on-device from one audio span.

            span: (L, n_in) f32; rel: (B,) i32 window start offsets into
            span with PAD LANES ENCODED AS -1 (the lane-validity mask is
            derived on device — one fewer tunnel RPC per batch than shipping
            a separate f32 mask; ~30 ms of fixed roundtrip latency each on
            the axon link); video_u8: uint8 frames — either (B, T, H, W, 3)
            RGB or (B, T, H*3/2, W) raw I420 planes (the rank picks the
            branch at trace time; planes are chroma-upsampled and
            color-converted on device) — or None. Padded lanes are zeroed
            (not dropped): the model runs BatchNorm on batch statistics even
            at eval (the reference quirk, models/resnet.py docstring), so
            real lanes see pad lanes through the batch moments — zero lanes
            reproduce the host/reference zero-padding bit for bit.
            """
            import jax.numpy as jnp

            if span.dtype == jnp.int16:
                # lossless PCM16 transport: wav decode is int16/32768 in f32
                # (utils/io_audio.py), so the host re-quantization is exact
                # and the span ships at half the f32 bytes
                span = span.astype(jnp.float32) / 32768.0
            valid = (rel >= 0).astype(jnp.float32)
            offs = jnp.maximum(rel, 0)
            # batched dynamic_slice, NOT take with a (B, snd_size) index
            # matrix: the latter materializes B*snd_size int32 indices and
            # gathers element-wise — measured 49.6 ms vs 1.7 ms for the
            # slice form at B=128 on v5e (the windows are contiguous rows,
            # so only the B start offsets are really dynamic)
            audio = jax.vmap(
                lambda r: jax.lax.dynamic_slice(
                    span, (r, 0), (snd_size, span.shape[1])))(offs)
            audio = audio * valid[:, None, None]
            video = None
            if video_u8 is not None:
                if video_u8.ndim == 4:  # raw I420 planes
                    h = video_u8.shape[2] * 2 // 3
                    video = yuv420_planes_to_rgb01(video_u8, h) - 0.5
                else:
                    video = video_u8.astype(jnp.float32) / 255.0 - 0.5
                video = video * valid[:, None, None, None, None]
            out = fwd(state, audio, video, None)
            if f16_fetch:  # the ctor arg, not self: trace-time constant
                out = out.astype(jnp.float16)
            # flatten BEFORE the fetch: repacking the (B, snd_dur, 3)
            # tiled layout on device (HBM-bandwidth, ~us) lets the tunnel
            # stream a linear buffer — measured 101 ms vs 137 ms for the
            # 3-D f16 fetch at batch 128 (same bytes, same minutes).
            # Split into sub-cliff parts (see d2h_chunk_bytes): a tuple of
            # outputs of this one program, fetched sequentially by drain.
            flat = out.reshape(-1)
            assert flat.size == out_elems, (flat.size, out_elems)
            return tuple(flat[i * part_elems: min((i + 1) * part_elems, out_elems)]
                         for i in range(n_parts))

        self.fwd_span = jax.jit(fwd_span)
        # per-deploy link accounting (H2D/D2H bytes + stage seconds), read
        # by bench.py to bound the tunnel-limited e2e (PERF.md)
        self.h2d_stats = {"bytes": 0, "seconds": 0.0, "batches": 0,
                          "d2h_bytes": 0, "fetch_seconds": 0.0}

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
            mono = ambix[:n, g.nosep_ss: g.nosep_ss + g.snd_dur,
                         :g.num_in_channels] \
                .reshape(n * g.snd_dur, g.num_in_channels).copy()
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

    def _span_batches(self, reader, input_folder: str):
        """Host side of the on-device gather path: per batch, one contiguous
        mono span + int32 window offsets + uint8 frames."""
        import os as _os

        from spatialaudiogen_tpu.data.readers import VideoFrameReader

        g = self.geometry
        rate = self.cfg.audio_rate
        B = self.batch_size
        # fixed compiled span length; +16 slack absorbs float-time rounding
        span_len = (B - 1) * g.snd_dur + g.snd_size + 16
        video_reader = None
        if "video" in self.cfg.encoders:
            vdir = _os.path.join(input_folder, "video")
            if _os.path.isdir(vdir):
                video_reader = VideoFrameReader(
                    vdir, self.cfg.video_rate,
                    img_prep=lambda x: x)  # stay uint8; normalized on-device
            else:
                # jpg dir deleted after `sag-pack`: serve frames from the
                # pack (decoded RGB; the raw-4:2:0 upload path needs jpgs)
                from spatialaudiogen_tpu.data.packed import (
                    PackedVideoReader, is_packed)

                assert is_packed(input_folder), f"no frames in {input_folder}"
                video_reader = PackedVideoReader(
                    input_folder, self.cfg.video_rate, img_prep=lambda x: x)

        def yuv_ok():
            return (hasattr(video_reader, "yuv420_supported")
                    and video_reader.yuv420_supported())

        use_yuv = (video_reader is not None and self.yuv_frames is not False
                   and yuv_ok())
        if self.yuv_frames and video_reader is not None:
            assert yuv_ok(), \
                "yuv_frames=True but the frame dir has no native 4:2:0 path"

        def read_frames(t):
            if not use_yuv:
                return video_reader.get_by_index(t, g.vid_dur)
            planes = video_reader.get_yuv420_by_index(t, g.vid_dur)
            if planes is None:  # odd non-4:2:0 frame mid-dir: convert on host
                planes = host_rgb_to_i420(video_reader.get_by_index(t, g.vid_dur))
            return planes

        ts = reader.chunks_t
        ar = reader.audio_reader
        for k in range(0, len(ts), B):
            batch_ts = ts[k: k + B]
            n = len(batch_ts)
            starts = [g.chunk_start_sample(t) for t in batch_ts]
            rel = np.array(starts, np.int32) - starts[0]
            assert rel.max() + g.snd_size <= span_len, "window drift > slack"
            # pad lanes ride as rel=-1: fwd_span derives the lane mask from
            # the sign, so no separate `valid` upload is needed
            rel = np.concatenate([rel, np.full(B - n, -1, np.int32)])
            span = ar.get(starts[0] / rate, span_len, None)[:, :g.num_in_channels]
            video_u8 = None
            if video_reader is not None:
                frames = [read_frames(t) for t in batch_ts]
                frames += [frames[-1]] * (B - n)
                video_u8 = np.stack(frames, 0)
            mono = np.concatenate(
                [span[r + g.nosep_ss: r + g.nosep_ss + g.snd_dur,
                      :g.num_in_channels]
                 for r in rel[:n]], 0)
            # ship PCM16-sourced spans as int16 (exactly invertible on
            # device: wav decode is int16/32768); any span not exactly on
            # the PCM16 grid stays f32. Mono was extracted above, so the
            # passthrough stays float regardless.
            from spatialaudiogen_tpu.utils.io_audio import pcm16_exact

            i16 = pcm16_exact(span)
            if i16 is not None:
                span = i16
            yield n, span, rel, video_u8, mono

    def _predict_span_ondevice(self, input_folder: str, start: float,
                               duration: float | None):
        """Decode in a background thread; issue EVERY tunnel RPC (upload,
        dispatch, fetch) from this one thread, fetching two batches behind
        dispatch.

        The structure is load-bearing on the axon tunnel: an A/B on a 240 s
        audio-only clip (batch 128) measured the previous design — upload
        device_puts on one thread, np.asarray fetches on another — at
        ~11x realtime while THIS loop ran 59-72x and a fully serial loop
        48x. Concurrent RPCs from separate threads convoy pathologically in
        the tunnel client (~5x worse than just serializing); single-thread
        issue order with a lag-2 fetch reaches the link's byte-flow bound.
        device_put is async (the call returns in ~2-6 ms), so decode is the
        only stage that benefits from its own thread — and it is CPU-only,
        touching no RPCs. NOTE: out.copy_to_host_async() deadlocks on this
        tunnel when the value is still pending (verified empirically);
        lagging np.asarray is the safe overlap mechanism.
        """
        import time as _time

        from spatialaudiogen_tpu.data.generic import BackgroundGenerator

        g = self.geometry
        reader = self._reader(input_folder, start, duration)
        n_windows = len(reader.chunks_t)
        if not n_windows:
            raise ValueError(f"no windows to deploy in {input_folder}")
        # preallocate the full outputs: a 10-minute clip returns ~340 MB of
        # f32 predictions, and list-append + final np.concatenate costs a
        # second-pass copy of all of it (measured ~1-2 s on the 1-CPU bench
        # host); writing each fetched batch straight into its slice also
        # fuses the f16->f32 widening into the single store
        total = n_windows * g.snd_dur
        mono_out = np.empty((total, g.num_in_channels), np.float32)
        pred_out = np.empty((total, self._n_out), np.float32)
        pred_flat = pred_out.reshape(-1)  # C-contiguous view
        mono_fill = pred_fill = 0
        pending = []  # (n, device_parts) — fetch lags dispatch by 2 batches

        def drain(entry):
            nonlocal pred_fill
            n, parts = entry
            # flat layout is batch-major, so the valid lanes are exactly the
            # first `need` elements; wholly-pad tail parts skip their RPC
            need = n * g.snd_dur * self._n_out
            base = pred_fill * self._n_out
            got = 0
            t0 = _time.perf_counter()
            for part in parts:
                if got >= need:
                    break
                host = np.asarray(part)  # sub-cliff chunk of the flat pred
                self.h2d_stats["d2h_bytes"] += host.nbytes
                take = min(host.size, need - got)
                # f16 -> f32 widening fuses into this single store
                pred_flat[base + got: base + got + take] = host[:take]
                got += take
            self.h2d_stats["fetch_seconds"] += _time.perf_counter() - t0
            pred_fill += n * g.snd_dur

        for n, span, rel, video_u8, mono in BackgroundGenerator(
                self._span_batches(reader, input_folder), depth=2):
            mono_out[mono_fill: mono_fill + mono.shape[0]] = mono
            mono_fill += mono.shape[0]
            t0 = _time.perf_counter()
            nbytes = span.nbytes + rel.nbytes
            span = jax.device_put(span, self._rep_shd)
            rel = jax.device_put(rel, self._batch_shd)
            if video_u8 is not None:
                nbytes += video_u8.nbytes
                video_u8 = jax.device_put(video_u8, self._batch_shd)
            self.h2d_stats["bytes"] += nbytes
            self.h2d_stats["seconds"] += _time.perf_counter() - t0
            self.h2d_stats["batches"] += 1
            out = self.fwd_span(self.state, span, rel, video_u8)
            pending.append((n, out))
            if len(pending) > 2:
                drain(pending.pop(0))
        for entry in pending:
            drain(entry)
        assert mono_fill == pred_fill == total
        return mono_out, pred_out

    def _predict_span(self, input_folder: str, start: float, duration: float | None):
        """One sliding pass -> (mono (T,1), pred (T, n_out))."""
        if "flow" not in self.cfg.encoders:
            return self._predict_span_ondevice(input_folder, start, duration)
        return self._predict_span_host(input_folder, start, duration)

    def _predict_span_host(self, input_folder: str, start: float,
                           duration: float | None):
        """Per-window host assembly (flow configs; also the parity oracle
        for the on-device gather path, tests/test_deploy.py)."""
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
            audio = jax.device_put(ambix[:, :, :n_in], self._batch_shd)
            if video is not None:
                video = jax.device_put(video, self._batch_shd)
            if flow is not None:
                flow = jax.device_put(flow, self._batch_shd)
            out = self.fwd(self.state, audio, video, flow)
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
        """Returns (T, n_in + n_out) ambisonics: the input passthrough
        channels (W at order 1; the full lower-order set at order 2+,
        geometry.num_in_channels) followed by the predicted channels, i.e.
        a complete order-N ACN layout (reference deploy.py:112-148 emits
        mono + 3 predicted at its fixed order 1)."""
        g = self.geometry
        self.h2d_stats = {"bytes": 0, "seconds": 0.0, "batches": 0,
                          "d2h_bytes": 0, "fetch_seconds": 0.0}
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
