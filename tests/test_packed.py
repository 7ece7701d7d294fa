"""Packed-media fast path (data/packed.py, `sag-pack`): window-for-window
parity with the decode readers, feeder/deploy integration, idempotence."""

import json
import os
import shutil

import numpy as np
import pytest

from spatialaudiogen_tpu.data import Feeder, SampleReader
from spatialaudiogen_tpu.data.packed import (PackedAudioReader,
                                             PackedFlowReader,
                                             PackedVideoReader, is_packed,
                                             main as pack_main, pack_video)
from spatialaudiogen_tpu.data.readers import (AudioChunkReader,
                                              FlowFrameReader,
                                              VideoFrameReader,
                                              img_prep_default)
from spatialaudiogen_tpu.data.synthetic import make_synthetic_dataset


@pytest.fixture(scope="module")
def packed_db(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("packdb"))
    ids = make_synthetic_dataset(root, n_videos=2, duration=3.0,
                                 frame_hw=(64, 128), with_flow=True, seed=3)
    pack_main([root, "--num_workers", "1"])  # the CLI end of the path
    return root, ids


def test_pack_idempotent_and_meta(packed_db):
    root, ids = packed_db
    folder = os.path.join(root, ids[0])
    assert is_packed(folder)
    mtime = os.path.getmtime(os.path.join(folder, "packed", "ambix.npy"))
    pack_video(folder)  # no force: must skip
    assert os.path.getmtime(os.path.join(folder, "packed", "ambix.npy")) == mtime
    meta = json.load(open(os.path.join(folder, "packed", "meta.json")))
    assert meta["rate"] == 48000 and meta["num_channels"] == 4
    # synthetic wavs are PCM16 -> the pack must take the lossless int16 form
    assert meta["audio_dtype"] == "int16"


def test_audio_reader_parity(packed_db):
    root, ids = packed_db
    folder = os.path.join(root, ids[0])
    wav = AudioChunkReader(os.path.join(folder, "ambix"), 48000, 1)
    mm = PackedAudioReader(folder, 48000, 1)
    assert (mm.num_frames, mm.num_channels) == (wav.num_frames, wav.num_channels)
    for start, size, rot in [(0.5, 52799, None), (-0.4, 52799, 1.2),
                             (2.7, 52799, -3.1), (0.0, 1, None)]:
        np.testing.assert_array_equal(mm.get(start, size, rot),
                                      wav.get(start, size, rot))


def test_video_flow_reader_parity(packed_db):
    root, ids = packed_db
    folder = os.path.join(root, ids[0])
    jpg = VideoFrameReader(os.path.join(folder, "video"), 10,
                           img_prep=img_prep_default)
    mm = PackedVideoReader(folder, 10, img_prep=img_prep_default)
    assert mm.frame_shape == jpg.frame_shape
    for start, size, rot in [(0.5, 1, None), (0.0, 4, 2.0), (2.9, 3, -1.0)]:
        np.testing.assert_array_equal(mm.get_by_index(start, size, rot),
                                      jpg.get_by_index(start, size, rot))
    fdir = os.path.join(folder, "flow")
    jf = FlowFrameReader(fdir, os.path.join(fdir, "flow_limits.npy"), 10)
    mf = PackedFlowReader(folder, 10)
    for start, size in [(0.5, 1), (2.8, 4)]:
        np.testing.assert_array_equal(mf.get_by_index(start, size),
                                      jf.get_by_index(start, size))


def test_sample_reader_auto_vs_forced(packed_db):
    """Same rng => identical chunk stream from the packed and decode paths."""
    root, ids = packed_db
    folder = os.path.join(root, ids[0])
    kw = dict(return_video=True, img_prep=img_prep_default, return_flow=True,
              shuffle=True, random_rotations=True)
    packed = SampleReader(folder, rng=np.random.RandomState(7), **kw)
    decode = SampleReader(folder, rng=np.random.RandomState(7),
                          use_packed=False, **kw)
    assert isinstance(packed.audio_reader, PackedAudioReader)
    assert isinstance(decode.audio_reader, AudioChunkReader)
    for _ in range(3):
        a, b = packed.get(), decode.get()
        assert a["id"] == b["id"]
        for key in ("ambix", "video", "flow"):
            np.testing.assert_array_equal(a[key], b[key])


def test_packed_rate_mismatch_falls_back(packed_db):
    root, ids = packed_db
    r = SampleReader(os.path.join(root, ids[0]), audio_rate=24000,
                     video_rate=10, return_video=False, shuffle=False,
                     random_rotations=False)
    assert isinstance(r.audio_reader, AudioChunkReader)  # pack is 48 kHz


def test_feeder_and_deletion_of_sources(packed_db, tmp_path):
    """Feeder batches flow from a pack whose source media dirs are deleted
    (only audio_pow.lst must survive — chunk candidacy comes from it)."""
    root, ids = packed_db
    dup = str(tmp_path / "db")
    os.makedirs(dup)
    for yid in ids:
        shutil.copytree(os.path.join(root, yid), os.path.join(dup, yid))
        shutil.rmtree(os.path.join(dup, yid, "ambix"))
        shutil.rmtree(os.path.join(dup, yid, "video"))
        shutil.rmtree(os.path.join(dup, yid, "flow"))
    feeder = Feeder(dup, batch_size=4, n_workers=2, for_eval=True,
                    return_video=True, return_flow=True)
    feeder.start()
    batches = list(feeder.batches())
    feeder.stop()
    assert batches and batches[0]["ambix"].shape[1:] == (52799, 4)
    assert batches[0]["video"].shape[1:] == (1, 64, 128, 3)
    total = sum(b["ambix"].shape[0] for b in batches)
    assert total == feeder.count_chunks()


def test_deploy_from_pack_only(packed_db, tmp_path):
    """MonoToAmbix serves frames from the pack when video/ is gone."""
    jax = pytest.importorskip("jax")
    from spatialaudiogen_tpu.config import TrainConfig
    from spatialaudiogen_tpu.deploy.deploy import MonoToAmbix
    from spatialaudiogen_tpu.models import SptAudioGen
    from spatialaudiogen_tpu.train.checkpoint import save_checkpoint
    from spatialaudiogen_tpu.train.lr import make_optimizer
    from spatialaudiogen_tpu.train.state import create_train_state

    root, ids = packed_db
    dup = str(tmp_path / "clip")
    shutil.copytree(os.path.join(root, ids[0]), dup)
    shutil.rmtree(os.path.join(dup, "video"))
    shutil.rmtree(os.path.join(dup, "ambix"))

    model_dir = str(tmp_path / "model")
    os.makedirs(model_dir)
    cfg = TrainConfig(model_dir=model_dir, encoders=("audio", "video"),
                      separation="none", frame_hw=(64, 128))
    cfg.save(model_dir)
    model = SptAudioGen(cfg.model_config())
    g = cfg.model_config().geometry
    example = {
        "ambix": np.zeros((1, g.snd_size, g.num_ambi_channels), np.float32),
        "audio_mask": np.ones((1, g.num_ambi_channels), np.float32),
        "video": np.zeros((1, g.vid_dur, 64, 128, 3), np.float32)}
    state = create_train_state(model, make_optimizer(),
                               jax.random.PRNGKey(0), example)
    save_checkpoint(model_dir, state, 0)

    out = MonoToAmbix(model_dir, batch_size=4).deploy(dup, 0.5, 1.0)
    assert out.shape == (int(1.0 * 48000), 4) and np.isfinite(out).all()
