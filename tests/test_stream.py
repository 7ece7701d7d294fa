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


def test_stream_memory_bounded(clip_and_models):
    from spatialaudiogen_tpu.deploy.stream import StreamingMonoToAmbix

    clip, models = clip_and_models
    stream = StreamingMonoToAmbix(models["audio"])
    mono = _mono_of(clip, 4.0)
    for _ in range(6):  # 24 s of audio through a bounded buffer
        for i in range(0, len(mono), 48000):
            stream.push(mono[i: i + 48000])
    g = stream.geometry
    assert len(stream._buf) < 8 * g.snd_size
    assert len(stream._frames) == 0


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
