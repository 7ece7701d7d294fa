"""Data pipeline tests over a synthetic dataset in the reference layout."""

import os

import numpy as np
import pytest

from spatialaudiogen_tpu.data import Feeder, FilenameProvider, SampleReader
from spatialaudiogen_tpu.data.pipeline import device_prefetch
from spatialaudiogen_tpu.data.readers import AudioChunkReader, img_prep_default
from spatialaudiogen_tpu.data.synthetic import make_synthetic_dataset


@pytest.fixture(scope="module")
def dataset(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("synthdb"))
    ids = make_synthetic_dataset(root, n_videos=2, duration=3.0,
                                 frame_hw=(64, 128), with_flow=True, seed=0)
    return root, ids


def test_filename_provider(dataset):
    root, ids = dataset
    p = FilenameProvider(root, num_epochs=2, shuffle=False)
    seen = list(p.loop_samples())
    assert seen == sorted(ids) * 2


def test_audio_chunk_reader_padding(dataset):
    root, ids = dataset
    r = AudioChunkReader(os.path.join(root, ids[0], "ambix"), 48000, 1)
    assert r.num_channels == 4 and r.duration == 3
    # window straddling the start: zero-padded before
    chunk = r.get(-0.5, 48000)
    assert chunk.shape == (48000, 4)
    assert np.all(chunk[:24000] == 0) and np.any(chunk[24000:] != 0)
    # window straddling the end: zero-padded after
    chunk = r.get(2.5, 48000)
    assert np.any(chunk[:24000] != 0) and np.all(chunk[24000:] == 0)


def test_audio_rotation_preserves_w_and_energy(dataset):
    root, ids = dataset
    r = AudioChunkReader(os.path.join(root, ids[0], "ambix"), 48000, 1)
    plain = r.get(1.0, 4800)
    rot = r.get(1.0, 4800, rotation=1.0)
    np.testing.assert_allclose(rot[:, 0], plain[:, 0], atol=1e-12)   # W invariant
    np.testing.assert_allclose(rot[:, 2], plain[:, 2], atol=1e-12)   # Z invariant
    np.testing.assert_allclose((rot ** 2).sum(), (plain ** 2).sum(), rtol=1e-9)


def test_sample_reader_shapes(dataset):
    root, ids = dataset
    reader = SampleReader(os.path.join(root, ids[0]), return_video=True,
                          img_prep=img_prep_default, return_flow=True,
                          shuffle=False, random_rotations=False,
                          rng=np.random.RandomState(0))
    chunk = reader.get()
    assert chunk["ambix"].shape == (52799, 4)
    assert chunk["video"].shape == (1, 64, 128, 3)
    assert chunk["flow"].shape == (1, 64, 128, 3)
    assert chunk["id"].startswith(ids[0])
    # audio window centered at t: the target window starts at t
    assert abs(reader.chunks_t[0] - 0.5) < 1e-9


def test_sample_reader_eval_sharding(dataset):
    root, ids = dataset
    full = SampleReader(os.path.join(root, ids[0]), return_video=False,
                        shuffle=False, random_rotations=False, skip_rate=2)
    parts = [SampleReader(os.path.join(root, ids[0]), return_video=False,
                          shuffle=False, random_rotations=False, skip_rate=2,
                          num_workers=3, worker_id=w) for w in range(3)]
    merged = sum((p.chunks_t for p in parts), [])
    assert sorted(merged) == sorted(full.chunks_t)


def test_feeder_train_batches(dataset):
    root, ids = dataset
    feeder = Feeder(root, batch_size=4, n_workers=2, for_eval=False, return_video=True)
    feeder.start()
    try:
        it = feeder.batches()
        batch = next(it)
        assert batch["ambix"].shape == (4, 52799, 4)
        assert batch["video"].shape == (4, 1, 64, 128, 3)
        assert batch["audio_mask"].shape == (4, 4)
        assert len(batch["id"]) == 4
        batch2 = next(it)
        assert batch2["ambix"].shape == (4, 52799, 4)
    finally:
        feeder.stop()


def test_feeder_eval_one_pass(dataset):
    root, ids = dataset
    feeder = Feeder(root, batch_size=8, n_workers=2, for_eval=True,
                    return_video=False)
    expected = feeder.count_chunks()
    feeder.start()
    total = 0
    seen = []
    for batch in feeder.batches():
        total += batch["ambix"].shape[0]
        seen.extend(batch["id"])
    assert total == expected == len(set(seen))
    # deterministic single pass: every chunk exactly once, includes remainder


def test_device_prefetch(dataset):
    root, ids = dataset
    feeder = Feeder(root, batch_size=2, n_workers=1, for_eval=True,
                    return_video=False)
    feeder.start()
    n = 0
    for dev_batch, host in device_prefetch(feeder.batches()):
        assert hasattr(dev_batch["ambix"], "devices")
        assert "id" in host
        n += 1
    feeder.stop()
    assert n == 2  # 2 videos x 2 eval chunks / batch 2, drained through prefetch


@pytest.fixture(scope="module")
def big_dataset(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("shardd"))
    ids = make_synthetic_dataset(root, n_videos=5, duration=2.0,
                                 frame_hw=(32, 64), seed=4)
    return root, ids


def test_provider_shards_disjoint_exhaustive(big_dataset):
    """Multi-host video sharding: shards partition the dataset — pairwise
    disjoint and jointly exhaustive for every shard count (replaces the
    reference's thread split, feeder.py:232-234)."""
    root, ids = big_dataset
    full = FilenameProvider(root, num_epochs=1)
    for num_shards in (1, 2, 3, 5):
        shards = [FilenameProvider(root, num_epochs=1, shard=(s, num_shards))
                  for s in range(num_shards)]
        union = sum((p.sample_ids for p in shards), [])
        assert sorted(union) == sorted(full.sample_ids)
        assert len(union) == len(set(union))  # pairwise disjoint
        # near-even balance: shard sizes differ by at most 1
        sizes = [len(p.sample_ids) for p in shards]
        assert max(sizes) - min(sizes) <= 1


def test_feeder_shards_union_equals_single_run(big_dataset):
    """A 2-shard eval feeder run covers exactly the sample ids of the
    1-shard run, with no duplicates across shards."""
    root, ids = big_dataset

    def run(shard_id, num_shards):
        feeder = Feeder(root, batch_size=4, n_workers=2, for_eval=True,
                        return_video=False, shard_id=shard_id,
                        num_shards=num_shards)
        feeder.start()
        seen = []
        for batch in feeder.batches():
            seen.extend(batch["id"])
        return seen

    single = run(0, 1)
    s0, s1 = run(0, 2), run(1, 2)
    assert set(s0) & set(s1) == set()
    assert sorted(s0 + s1) == sorted(single)
    assert len(s0 + s1) == len(single)  # exact multiset match, no dupes


def test_shard_times_eval_worker_split_composes(big_dataset):
    """Host shard (videos) x eval worker chunk split (within video) must
    jointly cover every chunk exactly once."""
    root, ids = big_dataset
    all_chunks = set()
    for yid in ids:
        r = SampleReader(os.path.join(root, yid), return_video=False,
                         shuffle=False, random_rotations=False, skip_rate=10)
        all_chunks |= {(yid, t) for t in r.chunks_t}
    covered = []
    for shard_id in range(2):
        provider = FilenameProvider(root, num_epochs=1, shard=(shard_id, 2))
        for yid in provider.loop_samples():
            for w in range(3):
                r = SampleReader(os.path.join(root, yid), return_video=False,
                                 shuffle=False, random_rotations=False,
                                 skip_rate=10, num_workers=3, worker_id=w)
                covered.extend((yid, t) for t in r.chunks_t)
    assert len(covered) == len(set(covered))
    assert set(covered) == all_chunks
