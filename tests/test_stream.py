"""Streaming serving mode (deploy/stream.py) vs the batch deploy engine."""

import numpy as np
import pytest

from spatialaudiogen_tpu.config import TrainConfig
from spatialaudiogen_tpu.data.synthetic import make_synthetic_dataset
from spatialaudiogen_tpu.train.trainer import Trainer


@pytest.fixture(scope="module")
def clip_and_models(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("streamdb"))
    make_synthetic_dataset(root, n_videos=1, duration=4.0, frame_hw=(64, 128),
                           seed=3)
    models = {}
    for name, encoders in (("audio", ("audio",)),
                           ("av", ("audio", "video"))):
        model_dir = str(tmp_path_factory.mktemp(f"streammodel_{name}"))
        cfg = TrainConfig(db_dir=root, model_dir=model_dir, encoders=encoders,
                          separation="none" if name == "audio" else "unet_mask",
                          n_iters=2, batch_size=2, n_workers=2,
                          frame_hw=(64, 128), log_every=10, ckpt_every=0,
                          n_data=1, seed=0)
        Trainer(cfg).train()
        models[name] = model_dir
    import os

    clip = os.path.join(root, sorted(os.listdir(root))[0])
    return clip, models


def _mono_of(clip: str, seconds: float) -> np.ndarray:
    from spatialaudiogen_tpu.data.readers import AudioChunkReader

    reader = AudioChunkReader(clip + "/ambix", rate=None, ambi_order=1)
    return reader.get(0.0, int(seconds * reader.rate))[:, 0]


def _frames_of(clip: str, n: int) -> list:
    from spatialaudiogen_tpu.data.readers import VideoFrameReader

    reader = VideoFrameReader(clip + "/video",
                              rate=VideoFrameReader.RAW_RATE,
                              img_prep=lambda x: x)
    return [reader.get_by_index(i / 10.0, 1)[0] for i in range(n)]


def test_stream_matches_batch_deploy_audio(clip_and_models):
    from spatialaudiogen_tpu.deploy.deploy import MonoToAmbix
    from spatialaudiogen_tpu.deploy.stream import StreamingMonoToAmbix

    clip, models = clip_and_models
    duration = 1.5  # 15 windows
    batch = MonoToAmbix(models["audio"], batch_size=1)
    ref = batch.deploy(clip, 0.5, duration)

    stream = StreamingMonoToAmbix(models["audio"])
    assert abs(stream.algorithmic_latency_s - 0.5) < 1e-3
    mono = _mono_of(clip, 0.5 + duration + 1.2)
    chunks = []
    rng = np.random.RandomState(0)
    pos = 0
    while pos < len(mono):  # odd-sized blocks: emission must not care
        n = int(rng.randint(1000, 30000))
        chunks += stream.push(mono[pos: pos + n])
        pos += n
    got = np.concatenate(chunks, axis=0)[: ref.shape[0]]
    np.testing.assert_array_equal(got, ref)


def test_stream_matches_batch_deploy_video(clip_and_models):
    from spatialaudiogen_tpu.deploy.deploy import MonoToAmbix
    from spatialaudiogen_tpu.deploy.stream import StreamingMonoToAmbix

    clip, models = clip_and_models
    duration = 1.0
    batch = MonoToAmbix(models["av"], batch_size=1, yuv_frames=False)
    ref = batch.deploy(clip, 0.5, duration)

    stream = StreamingMonoToAmbix(models["av"])
    mono = _mono_of(clip, 0.5 + duration + 1.2)
    frames = _frames_of(clip, int(np.ceil(len(mono) / 4800)))
    chunks = []
    block = 4800  # one frame per 0.1 s of audio, as a live mux would
    for i in range(0, len(mono), block):
        frame = frames[i // block] if i // block < len(frames) else None
        chunks += stream.push(mono[i: i + block], frame)
    got = np.concatenate(chunks, axis=0)[: ref.shape[0]]
    np.testing.assert_array_equal(got, ref)


def test_stream_matches_batch_deploy_flow(tmp_path):
    """Flow configs stream through the host-assembly forward: the emitted
    stream is bit-identical to MonoToAmbix(batch_size=1).deploy() over the
    same samples (same jitted engine.fwd executable, same per-window float
    arrays as deploy.py _predict_span_host assembles). Flow frames push at
    the 10 fps cadence as (H, W, 3) float (dx, dy, mag); an (H, W, 2) raw
    (dx, dy) push derives the magnitude channel."""
    import os

    from spatialaudiogen_tpu.data.readers import (FlowFrameReader,
                                                   VideoFrameReader)
    from spatialaudiogen_tpu.deploy.deploy import MonoToAmbix
    from spatialaudiogen_tpu.deploy.stream import StreamingMonoToAmbix

    root = str(tmp_path / "db")
    ids = make_synthetic_dataset(root, n_videos=1, duration=4.0,
                                 frame_hw=(64, 128), with_flow=True, seed=11)
    model_dir = str(tmp_path / "model")
    cfg = TrainConfig(db_dir=root, model_dir=model_dir,
                      encoders=("audio", "flow"), separation="none",
                      n_iters=2, batch_size=2, n_workers=2,
                      frame_hw=(64, 128), log_every=10, ckpt_every=0,
                      n_data=1, seed=0)
    Trainer(cfg).train()
    clip = os.path.join(root, ids[0])

    duration = 1.0
    ref = MonoToAmbix(model_dir, batch_size=1).deploy(clip, 0.5, duration)

    stream = StreamingMonoToAmbix(model_dir)
    mono = _mono_of(clip, 0.5 + duration + 1.2)
    reader = FlowFrameReader(clip + "/flow",
                             os.path.join(clip, "flow", "flow_limits.npy"),
                             rate=VideoFrameReader.RAW_RATE)
    block = 4800
    chunks = []
    flow = None
    for k in range(0, len(mono), block):
        flow = reader.get_by_index((k // block) / 10.0, 1)[0]
        chunks += stream.push(mono[k: k + block], flow=flow)
    got = np.concatenate(chunks, axis=0)[: ref.shape[0]]
    np.testing.assert_array_equal(got, ref)

    # raw (dx, dy) pushes derive the magnitude channel
    s = StreamingMonoToAmbix(model_dir)
    s.push(None, flow=flow[..., :2])
    f = s._session._flows[0]
    np.testing.assert_allclose(f[..., 2], np.hypot(f[..., 0], f[..., 1]),
                               rtol=1e-6)


def test_stream_matches_batch_deploy_video_flow(tmp_path):
    """Video+flow configs: the host-assembly stream path normalizes RGB
    frames with img_prep_default's f32 arithmetic (f64-then-cast differs
    by 1 ulp for pixels 64-191, which would break bit-parity), so the
    emitted stream stays bit-identical to the batch-1 deploy."""
    import os

    from spatialaudiogen_tpu.data.readers import (FlowFrameReader,
                                                   VideoFrameReader)
    from spatialaudiogen_tpu.deploy.deploy import MonoToAmbix
    from spatialaudiogen_tpu.deploy.stream import StreamingMonoToAmbix

    root = str(tmp_path / "db")
    ids = make_synthetic_dataset(root, n_videos=1, duration=4.0,
                                 frame_hw=(64, 128), with_flow=True, seed=12)
    model_dir = str(tmp_path / "model")
    cfg = TrainConfig(db_dir=root, model_dir=model_dir,
                      encoders=("audio", "video", "flow"), separation="none",
                      n_iters=2, batch_size=2, n_workers=2,
                      frame_hw=(64, 128), log_every=10, ckpt_every=0,
                      n_data=1, seed=0)
    Trainer(cfg).train()
    clip = os.path.join(root, ids[0])

    duration = 1.0
    ref = MonoToAmbix(model_dir, batch_size=1).deploy(clip, 0.5, duration)

    stream = StreamingMonoToAmbix(model_dir)
    mono = _mono_of(clip, 0.5 + duration + 1.2)
    frames = _frames_of(clip, int(np.ceil(len(mono) / 4800)))
    reader = FlowFrameReader(clip + "/flow",
                             os.path.join(clip, "flow", "flow_limits.npy"),
                             rate=VideoFrameReader.RAW_RATE)
    block = 4800
    chunks = []
    for k in range(0, len(mono), block):
        i = k // block
        frame = frames[i] if i < len(frames) else None
        flow = reader.get_by_index(i / 10.0, 1)[0]
        chunks += stream.push(mono[k: k + block], frame, flow=flow)
    got = np.concatenate(chunks, axis=0)[: ref.shape[0]]
    np.testing.assert_array_equal(got, ref)
    # substitution counters are per-modality (none dropped here)
    assert stream.video_frames_substituted == 0
    assert stream.flow_frames_substituted == 0


def test_stream_memory_bounded(clip_and_models):
    from spatialaudiogen_tpu.deploy.stream import StreamingMonoToAmbix

    clip, models = clip_and_models
    stream = StreamingMonoToAmbix(models["audio"])
    mono = _mono_of(clip, 4.0)
    for _ in range(6):  # 24 s of audio through a bounded buffer
        for i in range(0, len(mono), 48000):
            stream.push(mono[i: i + 48000])
    g = stream.geometry
    assert len(stream._session._buf) < 8 * g.snd_size
    assert len(stream._session._frames) == 0


def test_serve_cli_matches_deploy(clip_and_models, tmp_path):
    """sag-serve over a wav equals sag-deploy --batch_size 1 on the same
    windows (file-fed face of the streaming engine)."""
    import os

    from spatialaudiogen_tpu.cli.serve import main as serve_main
    from spatialaudiogen_tpu.deploy.deploy import MonoToAmbix
    from spatialaudiogen_tpu.utils.io_audio import load_wav, save_wav

    clip, models = clip_and_models
    mono = _mono_of(clip, 3.0)
    in_wav = str(tmp_path / "in.wav")
    # float32 wav: a PCM16 input would perturb the model input by ~1/65536
    # and the predictions by ~1e-4, muddying the parity check
    save_wav(in_wav, mono[:, None], 48000, subtype="float32")
    out_wav = str(tmp_path / "out.wav")
    serve_main([models["audio"], in_wav, out_wav])
    got, rate = load_wav(out_wav, dtype=np.float32)
    assert rate == 48000 and got.shape[1] == 4

    ref = MonoToAmbix(models["audio"], batch_size=1).deploy(clip, 0.5, 1.3)
    # the OUTPUT wav round-trip is PCM16-quantized (save_wav default)
    np.testing.assert_allclose(got[: ref.shape[0]], ref, atol=1.1 / 32768)
    assert os.path.getsize(out_wav) > 0


def test_serve_cli_batched_sessions(clip_and_models, tmp_path):
    """sag-serve with comma-separated inputs multiplexes sessions through
    one StreamBatcher; each output matches its single-session serve to
    within the PCM16 wav quantization + one f16 transport ulp."""
    from spatialaudiogen_tpu.cli.serve import main as serve_main
    from spatialaudiogen_tpu.utils.io_audio import load_wav, save_wav

    clip, models = clip_and_models
    mono = _mono_of(clip, 3.2)
    ins, single_outs = [], []
    for i, off in enumerate((0, 9000)):
        sig = np.roll(mono, -off)[:144000 - 4800 * i]  # different lengths
        fn = str(tmp_path / f"in{i}.wav")
        save_wav(fn, sig[:, None], 48000, subtype="float32")
        ins.append(fn)
        out1 = str(tmp_path / f"single{i}.wav")
        serve_main([models["audio"], fn, out1])
        single_outs.append(out1)
    outs = [str(tmp_path / f"out{i}.wav") for i in range(2)]
    serve_main([models["audio"], ",".join(ins), ",".join(outs)])
    for got_fn, want_fn in zip(outs, single_outs):
        got, _ = load_wav(got_fn, dtype=np.float32)
        want, _ = load_wav(want_fn, dtype=np.float32)
        assert got.shape == want.shape
        np.testing.assert_allclose(got, want, atol=2.5 / 32768)


def test_serve_cli_batched_video_sessions(clip_and_models, tmp_path):
    """Batched sag-serve of a VIDEO model: per-session --frames_dir wiring.
    CLI plumbing parity: the outputs must equal a library StreamBatcher fed
    the identical block/frame schedule (video lanes share batch statistics
    — the batch-deploy semantics, deploy/stream.py — so single-session
    serve is NOT the oracle here)."""
    from spatialaudiogen_tpu.cli.serve import main as serve_main
    from spatialaudiogen_tpu.deploy.stream import StreamBatcher
    from spatialaudiogen_tpu.utils.io_audio import load_wav, save_wav

    clip, models = clip_and_models
    mono = _mono_of(clip, 2.0)
    n_blocks = len(mono) // 4800
    frames = _frames_of(clip, n_blocks)
    sigs = [mono, np.roll(mono, -4800)]
    ins = []
    for i, sig in enumerate(sigs):
        fn = str(tmp_path / f"in{i}.wav")
        save_wav(fn, sig[:, None], 48000, subtype="float32")
        ins.append(fn)
    outs = [str(tmp_path / f"out{i}.wav") for i in range(2)]
    frames_dir = clip + "/video"
    serve_main([models["av"], ",".join(ins), ",".join(outs),
                "--frames_dir", f"{frames_dir},{frames_dir}"])

    # library oracle: same schedule (one block + one frame per tick)
    b = StreamBatcher(models["av"], capacity=2)
    sids = [b.add_session(), b.add_session()]
    ref = {s: [] for s in sids}
    for k in range(0, len(mono), 4800):
        for i, sid in enumerate(sids):
            fr = frames[k // 4800] if k // 4800 < len(frames) else frames[-1]
            b.push(sid, sigs[i][k: k + 4800], fr)
        for sid, chunks in b.tick().items():
            ref[sid].extend(chunks)
    for sid in sids:
        for k, v in b.flush(sid).items():
            ref[k].extend(v)
    for i, sid in enumerate(sids):
        got, _ = load_wav(outs[i], dtype=np.float32)
        want = np.concatenate(ref[sid], axis=0)
        assert got.shape == want.shape, (got.shape, want.shape)
        np.testing.assert_allclose(got, want, atol=1.1 / 32768)


def test_flush_emits_all_output_within_pushed_audio(clip_and_models):
    """flush() zero-pads the future context so output covers [0.5 s, T)."""
    from spatialaudiogen_tpu.deploy.stream import StreamingMonoToAmbix

    clip, models = clip_and_models
    stream = StreamingMonoToAmbix(models["audio"])
    mono = _mono_of(clip, 3.0)
    chunks = stream.push(mono)
    chunks += stream.flush()
    got = np.concatenate(chunks, axis=0)
    assert got.shape[0] == int((3.0 - 0.5) * 48000)
    # flushing again emits nothing new
    assert stream.flush() == []


def test_stream_batcher_lane_isolation_is_bitwise(clip_and_models):
    """No cross-session leakage, proven bitwise: a session's output through
    the batcher is bit-identical whether it runs ALONE or packed with other
    live sessions (same compiled executable, same lane shapes — the only
    difference is the neighbors' data, which must not matter for audio-only
    models)."""
    from spatialaudiogen_tpu.deploy.stream import StreamBatcher

    clip, models = clip_and_models
    mono = _mono_of(clip, 3.0)

    def run_alone():
        b = StreamBatcher(models["audio"], capacity=4)
        sid = b.add_session()
        out = []
        for i in range(0, len(mono), 9600):
            b.push(sid, mono[i: i + 9600])
            for _, chunks in b.tick().items():
                out.extend(chunks)
        return out

    def run_packed():
        b = StreamBatcher(models["audio"], capacity=4)
        sid = b.add_session()
        others = [b.add_session() for _ in range(3)]
        rng = np.random.RandomState(7)
        out = []
        for i in range(0, len(mono), 9600):
            b.push(sid, mono[i: i + 9600])
            for o in others:  # neighbors stream unrelated noise
                b.push(o, rng.randn(9600).astype(np.float32) * 0.2)
            for got_sid, chunks in b.tick().items():
                if got_sid == sid:
                    out.extend(chunks)
        return out

    alone, packed = run_alone(), run_packed()
    assert len(alone) == len(packed) > 10
    np.testing.assert_array_equal(
        np.concatenate(alone), np.concatenate(packed))


def test_stream_batcher_matches_independent_streams(clip_and_models):
    """N multiplexed sessions == N independent batch-1 streams (audio-only:
    the audio path's BatchNorm uses running averages at eval, so lanes are
    mathematically independent). Batch-C and batch-1 are different XLA
    executables whose per-lane reductions reorder (~1e-7 f32), so after the
    f16 transport cast each element agrees bitwise (observed >99.5%) or
    lands on an adjacent f16 code — the exact bound is one f16 ulp AT THAT
    ELEMENT'S MAGNITUDE (a fixed atol flakes: fresh fixture weights shift
    element magnitudes and the ulp scales with them). The bitwise
    no-leakage guarantee is test_stream_batcher_lane_isolation_is_bitwise.
    Sessions start at staggered offsets and push odd-sized blocks; one
    joins mid-run, one leaves."""
    from spatialaudiogen_tpu.deploy.stream import (StreamBatcher,
                                                   StreamingMonoToAmbix)

    clip, models = clip_and_models
    mono = _mono_of(clip, 4.0)
    offsets = [0, 7000, 48000, 3]  # distinct per-session signals
    signals = [np.roll(mono, -off)[: len(mono) - 48000] for off in offsets]

    # ground truth: independent batch-1 streams
    ref = {}
    for i, sig in enumerate(signals):
        s = StreamingMonoToAmbix(models["audio"])
        ref[i] = s.push(sig) + s.flush()

    batcher = StreamBatcher(models["audio"], capacity=4)
    sids = [batcher.add_session() for _ in range(3)]  # session 3 joins later
    got = {i: [] for i in range(4)}
    rng = np.random.RandomState(1)
    pos = 0
    joined3 = False
    while pos < len(signals[0]):
        n = int(rng.randint(3000, 20000))
        for i, sid in enumerate(sids):
            batcher.push(sid, signals[i][pos: pos + n])
        pos += n
        if not joined3 and pos > 60000:
            sids.append(batcher.add_session())  # join mid-run
            batcher.push(sids[3], signals[3][:pos])
            joined3 = True
        for sid, chunks in batcher.tick().items():
            got[sids.index(sid)].extend(chunks)
    for i, sid in enumerate(sids):
        for k, v in batcher.flush(sid).items():
            got[sids.index(k)].extend(v)
    for i in range(4):
        assert len(got[i]) == len(ref[i]), (i, len(got[i]), len(ref[i]))
        a, b = np.concatenate(got[i]), np.concatenate(ref[i])
        # mono passthrough is host-side: bitwise either way
        np.testing.assert_array_equal(a[:, 0], b[:, 0], err_msg=f"s{i} mono")
        ulp = np.spacing(np.maximum(np.abs(a), np.abs(b)).astype(np.float16))
        over = np.abs(a - b) > ulp.astype(np.float32) * (1 + 1e-6)
        assert not over.any(), \
            f"s{i}: {over.sum()} elements differ by >1 f16 ulp " \
            f"(max {np.abs(a - b)[over].max():.3e})"
        assert (a == b).mean() > 0.995, f"s{i}: too few bitwise-equal"

    # leave: the lane frees and a new session can reuse it
    n0 = batcher.n_sessions
    batcher.remove_session(sids[0])
    assert batcher.n_sessions == n0 - 1
    sid_new = batcher.add_session()
    batcher.push(sid_new, signals[0][:100000])
    out = batcher.tick()
    assert len(out.get(sid_new, [])) >= 9
    np.testing.assert_allclose(
        np.concatenate(out[sid_new]),
        np.concatenate(ref[0][: len(out[sid_new])]), atol=2.5e-6)


def test_stream_batcher_video_matches_batch_semantics(clip_and_models):
    """Video models couple lanes through the reference's batch-statistics
    BatchNorm quirk — a single-session batcher at capacity 1 must still
    equal the batch-1 stream bitwise (same lane composition)."""
    from spatialaudiogen_tpu.deploy.stream import (StreamBatcher,
                                                   StreamingMonoToAmbix)

    clip, models = clip_and_models
    mono = _mono_of(clip, 2.5)
    frames = _frames_of(clip, int(np.ceil(len(mono) / 4800)))

    s = StreamingMonoToAmbix(models["av"])
    ref = []
    for i in range(0, len(mono), 4800):
        frame = frames[i // 4800] if i // 4800 < len(frames) else None
        ref += s.push(mono[i: i + 4800], frame)

    b = StreamBatcher(models["av"], capacity=1)
    sid = b.add_session()
    got = []
    for i in range(0, len(mono), 4800):
        frame = frames[i // 4800] if i // 4800 < len(frames) else None
        b.push(sid, mono[i: i + 4800], frame)
        for _, chunks in b.tick().items():
            got.extend(chunks)
    assert len(got) == len(ref)
    np.testing.assert_array_equal(np.concatenate(got), np.concatenate(ref))


def test_stream_batcher_mesh_sharded_matches_single_device(clip_and_models):
    """Multi-chip serving: a StreamBatcher over a ('data','model') mesh
    shards the lane axis (rolling buffer, per-tick inputs and outputs)
    across the data axis; emitted chunks must match the single-device
    batcher. f32 fetch and float tolerance, same rationale as
    test_deploy_mesh_sharded_matches_single_chip: different shardings
    reorder per-lane reductions ~1e-6. Covers an audio-only batcher (lanes
    independent: sharding adds zero collectives) and a video batcher (the
    batch-stats BatchNorm moments all-reduce across chips)."""
    from spatialaudiogen_tpu.deploy.stream import StreamBatcher
    from spatialaudiogen_tpu.parallel.mesh import make_mesh

    clip, models = clip_and_models
    mono = _mono_of(clip, 2.6)
    signals = [np.roll(mono, -off) for off in (0, 5000, 48000, 17)]
    frames = _frames_of(clip, 26)

    for name, n_frames in (("audio", 0), ("av", 1)):
        outs = []
        for mesh in (None, make_mesh(n_data=4, n_model=1)):
            b = StreamBatcher(models[name], capacity=4, f16_fetch=False,
                              mesh=mesh)
            sids = [b.add_session() for _ in range(4)]
            got = {sid: [] for sid in sids}
            block = b.geometry.snd_dur
            for k in range(0, len(mono) - block + 1, block):
                for i, sid in enumerate(sids):
                    frame = frames[k // block] if n_frames else None
                    b.push(sid, signals[i][k: k + block], frame)
                for sid, chunks in b.tick().items():
                    got[sid].extend(chunks)
            assert all(len(v) >= 5 for v in got.values())
            outs.append([np.concatenate(got[sid], 0) for sid in sids])
        for a, c in zip(*outs):
            np.testing.assert_array_equal(a[:, 0], c[:, 0])  # mono: host-side
            np.testing.assert_allclose(a, c, atol=1e-5, err_msg=name)


def test_congestion_stall_catch_up_semantics(clip_and_models):
    """Defined congestion policy, pinned: a stalled device delays but never
    drops. While the device is stalled, pushed samples accumulate in the
    session buffer (memory grows with the backlog, nothing else); once the
    stall clears, the next drain computes EVERY backlogged window in order,
    bit-equal to an unstalled run, and gc returns the buffer to its bounded
    steady state."""
    import time as _time

    from spatialaudiogen_tpu.deploy.stream import (StreamBatcher,
                                                   StreamingMonoToAmbix)

    clip, models = clip_and_models
    mono = _mono_of(clip, 4.0)

    # unstalled reference
    s_ref = StreamingMonoToAmbix(models["audio"])
    ref = s_ref.push(mono)

    # StreamingMonoToAmbix: stall the device fn for the first 2 windows
    stream = StreamingMonoToAmbix(models["audio"])
    real_fwd = stream.engine.fwd_span
    calls = {"n": 0}

    def stalled_fwd(*a, **k):
        calls["n"] += 1
        if calls["n"] <= 2:
            _time.sleep(0.2)  # simulated congestion
        return real_fwd(*a, **k)

    stream.engine.fwd_span = stalled_fwd
    got = []
    for i in range(0, len(mono), 4800):
        got += stream.push(mono[i: i + 4800])
    assert len(got) == len(ref)
    np.testing.assert_array_equal(np.concatenate(got), np.concatenate(ref))

    # StreamBatcher: pushes during a stalled tick() accumulate; one tick
    # after the stall drains the whole backlog, then gc re-bounds the buffer
    b = StreamBatcher(models["audio"], capacity=2)
    sid = b.add_session()
    sess = b._sessions[sid]
    g = b.geometry
    for i in range(0, len(mono), 4800):   # device "stalled": no tick() calls
        b.push(sid, mono[i: i + 4800])
    assert len(sess._buf) >= len(mono) - 4800  # backlog held, nothing lost
    out = b.tick()                        # stall clears: full catch-up
    n_expect = len(ref)
    assert len(out[sid]) == n_expect, (len(out[sid]), n_expect)
    # tolerance: capacity-2 vs batch-1 are different XLA executables (see
    # test_stream_batcher_matches_independent_streams)
    np.testing.assert_allclose(
        np.concatenate(out[sid]), np.concatenate(ref), atol=2.5e-6)
    assert len(sess._buf) < 8 * g.snd_size  # gc'd back to steady state
    assert b.tick() == {}                 # nothing pending after catch-up


def test_stream_i420_frames_track_rgb(clip_and_models):
    """Pushing raw (H*3/2, W) I420 planes (half the frame bytes — the form
    live 4:2:0 sources produce) tracks the RGB push to the same audio
    tolerance as the batch engine's yuv_frames path (the device
    triangle-filter chroma upsample vs exact RGB: frame inputs differ by
    chroma subsampling only). Covers BOTH the batch-1 stream (fwd_span's
    I420 branch) and the StreamBatcher tick (its own I420 branch)."""
    from spatialaudiogen_tpu.deploy.deploy import host_rgb_to_i420
    from spatialaudiogen_tpu.deploy.stream import (StreamBatcher,
                                                   StreamingMonoToAmbix)

    clip, models = clip_and_models
    mono = _mono_of(clip, 2.0)
    frames = _frames_of(clip, int(np.ceil(len(mono) / 4800)))
    planes = [host_rgb_to_i420(f[None])[0] for f in frames]

    def run_stream(push_frames):
        s = StreamingMonoToAmbix(models["av"])
        out = []
        for i in range(0, len(mono), 4800):
            k = i // 4800
            f = push_frames[k] if k < len(push_frames) else None
            out.extend(s.push(mono[i: i + 4800], f))
        out.extend(s.flush())
        return np.concatenate(out, 0)

    rgb, yuv = run_stream(frames), run_stream(planes)
    assert rgb.shape == yuv.shape
    np.testing.assert_array_equal(rgb[:, 0], yuv[:, 0])  # mono passthrough
    scale = np.abs(rgb[:, 1:]).max() + 1e-9
    assert np.abs(yuv[:, 1:] - rgb[:, 1:]).max() / scale < 0.05

    def run_batcher(push_frames):
        b = StreamBatcher(models["av"], capacity=2)
        sid = b.add_session()
        out = []
        for i in range(0, len(mono), 4800):
            k = i // 4800
            f = push_frames[k] if k < len(push_frames) else None
            b.push(sid, mono[i: i + 4800], f)
            for _, chunks in b.tick().items():
                out.extend(chunks)
        for _, chunks in b.flush(sid).items():
            out.extend(chunks)
        return np.concatenate(out, 0)

    b_rgb, b_yuv = run_batcher(frames), run_batcher(planes)
    assert b_rgb.shape == b_yuv.shape
    scale = np.abs(b_rgb[:, 1:]).max() + 1e-9
    assert np.abs(b_yuv[:, 1:] - b_rgb[:, 1:]).max() / scale < 0.05


def test_dropped_frames_do_not_stall(clip_and_models):
    """A live source that stops delivering frames keeps emitting audio
    (repeat-last-frame substitution after frame_patience_s) instead of
    stalling forever with an unbounded buffer."""
    from spatialaudiogen_tpu.deploy.stream import StreamingMonoToAmbix

    clip, models = clip_and_models
    stream = StreamingMonoToAmbix(models["av"])
    mono = _mono_of(clip, 3.5)
    frames = _frames_of(clip, 6)  # frames stop arriving at t=0.6
    emitted = []
    for i in range(0, len(mono), 4800):
        frame = frames[i // 4800] if i // 4800 < len(frames) else None
        emitted += stream.push(mono[i: i + 4800], frame)
    assert len(emitted) >= 15  # kept emitting well past the frame drop
    assert stream.frames_substituted > 0
