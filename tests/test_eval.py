"""Evaluator end-to-end test: train a tiny model, then evaluate it."""

import os

import numpy as np
import pytest

from spatialaudiogen_tpu.config import TrainConfig
from spatialaudiogen_tpu.data.synthetic import make_synthetic_dataset
from spatialaudiogen_tpu.eval.evaluator import ALL_METRICS, Evaluator
from spatialaudiogen_tpu.eval.host_metrics import (
    compute_envelope_dist,
    compute_mel_lsd,
    mel_filterbank,
    melspectrogram,
)
from spatialaudiogen_tpu.eval.parse_results import aggregate, parse_eval_detailed_file
from spatialaudiogen_tpu.train.trainer import Trainer


def test_mel_filterbank_properties():
    fb = mel_filterbank(48000, 2048, 128, 0.0, 12000)
    assert fb.shape == (128, 1025)
    assert np.all(fb >= 0)
    # every filter has support, and support is ordered by frequency
    peaks = fb.argmax(axis=1)
    assert np.all(np.diff(peaks) >= 0)
    assert fb.sum() > 0


def test_melspectrogram_tone_peak():
    """A pure tone must put its energy in the mel band containing it."""
    sr = 48000
    t = np.arange(sr // 2) / sr
    y = np.sin(2 * np.pi * 1000 * t)
    mel = melspectrogram(y, sr, 128, 12000)
    band = mel.mean(axis=1).argmax()
    fb = mel_filterbank(sr, 2048, 128, 0.0, 12000)
    freqs = np.linspace(0, sr / 2, 1025)
    peak_freq = freqs[fb[band].argmax()]
    assert abs(peak_freq - 1000) < 150


def test_host_metric_identity():
    rng = np.random.RandomState(0)
    x = rng.randn(4800, 3)
    assert np.allclose(compute_mel_lsd(x, x, 48000), 0)
    assert np.allclose(compute_envelope_dist(x, x), 0)
    y = x + 0.5 * rng.randn(4800, 3)
    assert np.all(compute_mel_lsd(y, x, 48000) > 0)
    assert np.all(compute_envelope_dist(y, x) > 0)


@pytest.fixture(scope="module")
def trained_model(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("evaldb"))
    make_synthetic_dataset(root, n_videos=2, duration=3.0, frame_hw=(64, 128), seed=3)
    model_dir = str(tmp_path_factory.mktemp("evalmodel"))
    cfg = TrainConfig(db_dir=root, model_dir=model_dir, encoders=("audio",),
                      separation="none", n_iters=3, batch_size=4, n_workers=2,
                      log_every=10, ckpt_every=0, n_data=1, seed=0)
    Trainer(cfg).train()
    return root, model_dir


def test_evaluator_sharded_matches_single_device(trained_model):
    import jax

    from spatialaudiogen_tpu.parallel.mesh import make_mesh

    root, model_dir = trained_model
    single = Evaluator(model_dir, batch_size=4, db_dir=root, emd_ang_res=36)
    s_sum, s_res = single.run(host_threads=2, print_every=0)
    mesh = make_mesh(n_data=4, n_model=1)
    sharded = Evaluator(model_dir, batch_size=4, db_dir=root, emd_ang_res=36,
                        mesh=mesh)
    m_sum, m_res = sharded.run(host_threads=2, print_every=0,
                               output_fn=os.path.join(model_dir, "eval-sharded.txt"))
    assert len(s_res) == len(m_res)
    for key in ("stft/avg", "mse/avg", "emd/dir"):
        assert m_sum[key] == pytest.approx(s_sum[key], rel=1e-3, abs=1e-5), key


def test_evaluator_end_to_end(trained_model):
    root, model_dir = trained_model
    evaluator = Evaluator(model_dir, batch_size=3, db_dir=root, emd_ang_res=36)
    summary, results = evaluator.run(host_threads=4)
    # 2 videos x 2 eval chunks (3 s video, skip_rate 10) = 4 samples
    assert len(results) == 4
    for m in ALL_METRICS:
        assert np.isfinite(summary[m]), m

    detailed = os.path.join(model_dir, "eval-detailed.txt")
    assert os.path.exists(detailed)
    vals, times, keys = parse_eval_detailed_file(detailed)
    assert keys == ALL_METRICS
    assert sum(v.shape[0] for v in vals.values()) == 4

    agg = aggregate(detailed)
    assert set(agg) == {"MSE", "STFT", "ENV", "EMD"}
    assert all(np.isfinite(v) for v in agg.values())


def test_evaluator_multihost_shard_union(trained_model):
    """Sharded eval partitions the sample set: two (shard_id, 2) passes are
    disjoint and union to the single-shard set (mirrors the trainer's
    process sharding; reference per-thread analogue feeder.py:232-234)."""
    root, model_dir = trained_model
    full = Evaluator(model_dir, batch_size=3, db_dir=root, emd_ang_res=36,
                     shard_id=0, num_shards=1)
    _, full_res = full.run(host_threads=2, print_every=0,
                           output_fn=os.path.join(model_dir, "eval-full.txt"))
    shard_ids = []
    for i in range(2):
        ev = Evaluator(model_dir, batch_size=3, db_dir=root, emd_ang_res=36,
                       shard_id=i, num_shards=2)
        _, res = ev.run(host_threads=2, print_every=0,
                        output_fn=os.path.join(model_dir, f"eval-shard{i}.txt"))
        shard_ids.append({sid for sid, _ in res})
    assert shard_ids[0] and shard_ids[1]
    assert not (shard_ids[0] & shard_ids[1])
    assert shard_ids[0] | shard_ids[1] == {sid for sid, _ in full_res}


def test_evaluator_bounds_inflight_and_streams(trained_model, monkeypatch):
    """With a slow host metric the eval loop BLOCKS at max_inflight instead
    of queueing every sample's arrays, and completed rows stream to disk."""
    import threading

    root, model_dir = trained_model
    ev = Evaluator(model_dir, batch_size=3, db_dir=root, emd_ang_res=36)
    gate = threading.Event()
    started = []
    orig = Evaluator._host_metrics

    def slow_metrics(self, sample):
        started.append(sample[0])
        gate.wait(timeout=30)
        return orig(self, sample)

    monkeypatch.setattr(Evaluator, "_host_metrics", slow_metrics)
    out_fn = os.path.join(model_dir, "eval-stream.txt")
    result = {}
    t = threading.Thread(
        target=lambda: result.update(
            zip(("summary", "results"),
                ev.run(output_fn=out_fn, host_threads=1, print_every=0,
                       max_inflight=1, flush_every=1))))
    t.start()
    import time

    try:
        # wait out jit compile etc. until the first metric actually starts
        deadline = time.time() + 120
        while time.time() < deadline and not started:
            time.sleep(0.05)
        # run() is now blocked in drain() on the gated future: it must NOT
        # race ahead submitting/starting further samples
        time.sleep(0.5)
        assert t.is_alive()
        assert len(started) == 1
    finally:
        gate.set()  # always release, or the orphan thread poisons later tests
    t.join(timeout=120)
    assert not t.is_alive()
    assert len(result["results"]) == 4
    # every row was streamed (flush_every=1), in sample order
    lines = open(out_fn).read().splitlines()
    assert len(lines) == 5  # header + 4 samples
    assert [ln.split(" | ")[0] for ln in lines[1:]] == [
        sid for sid, _ in result["results"]]


def test_evaluator_partial_file_on_crash(trained_model, monkeypatch):
    """A crash mid-eval leaves the already-scored rows on disk (reference
    dumps periodically, eval.py:210-215) instead of losing everything."""
    import threading

    root, model_dir = trained_model
    ev = Evaluator(model_dir, batch_size=3, db_dir=root, emd_ang_res=36)
    orig = Evaluator._host_metrics
    calls = []
    lock = threading.Lock()

    def failing_metrics(self, sample):
        with lock:
            calls.append(sample[0])
            n = len(calls)
        if n == 4:
            raise RuntimeError("injected host-metric crash")
        return orig(self, sample)

    monkeypatch.setattr(Evaluator, "_host_metrics", failing_metrics)
    out_fn = os.path.join(model_dir, "eval-crash.txt")
    with pytest.raises(RuntimeError, match="injected"):
        ev.run(output_fn=out_fn, host_threads=1, print_every=0, flush_every=1)
    lines = open(out_fn).read().splitlines()
    assert lines[0].startswith("SampleID")
    assert len(lines) == 4  # header + the 3 rows scored before the crash


def test_evaluator_compute_dtype_override(trained_model):
    """--compute_dtype overrides the dtype recorded at training time: an
    f32-trained model evaluated under bfloat16 yields close (not identical)
    metrics; the override propagates to the rebuilt model config."""
    import jax.numpy as jnp

    root, model_dir = trained_model
    f32 = Evaluator(model_dir, batch_size=3, db_dir=root, emd_ang_res=36)
    assert f32.model.cfg.dtype is None
    bf16 = Evaluator(model_dir, batch_size=3, db_dir=root, emd_ang_res=36,
                     compute_dtype="bfloat16")
    assert bf16.model.cfg.dtype == jnp.bfloat16
    s32, _ = f32.run(host_threads=2, print_every=0)
    s16, _ = bf16.run(host_threads=2, print_every=0,
                      output_fn=os.path.join(model_dir, "eval-bf16.txt"))
    assert s16["stft/avg"] == pytest.approx(s32["stft/avg"], rel=0.1)
    assert s16["stft/avg"] != s32["stft/avg"]  # genuinely different numerics


def test_parse_eval_results_merges_shard_files(tmp_path):
    """Multi-host shard files aggregate to the same numbers as the single
    concatenated file (sag-parse-eval accepts several paths)."""
    header = "SampleID | mse/avg stft/avg env_mse/avg emd/dir\n"
    rows = [f"vid{v} {t}.5 | {0.1*v+0.01*t} {2.0+v} {0.02*v} {0.03+0.01*t}\n"
            for v in range(3) for t in range(4)]
    whole = tmp_path / "all.txt"
    whole.write_text(header + "".join(rows))
    s0 = tmp_path / "eval-detailed.txt.shard0"
    s1 = tmp_path / "eval-detailed.txt.shard1"
    s0.write_text(header + "".join(rows[:5]))
    s1.write_text(header + "".join(rows[5:]))
    merged = aggregate([str(s0), str(s1)])
    single = aggregate(str(whole))
    assert merged == single


def test_eval_cli_overwrite_guard_covers_shards(tmp_path):
    """Stale per-shard files block a rerun unless --overwrite (which
    removes them, so sag-parse-eval can never merge two runs)."""
    import os

    import pytest as _pytest

    from spatialaudiogen_tpu.cli.eval import main as eval_main

    model_dir = str(tmp_path / "m")
    os.makedirs(model_dir)
    stale = os.path.join(model_dir, "eval-detailed.txt.shard3")
    open(stale, "w").write("SampleID | stale\n")
    with _pytest.raises(AssertionError, match="shard3"):
        eval_main([model_dir])
    # --overwrite removes the stale shard before evaluating; the run then
    # fails later for an unrelated reason (no checkpoint), which is fine —
    # the guard behavior is what we pin here.
    with _pytest.raises(Exception, match="(?i)checkpoint|config|params"):
        eval_main([model_dir, "--overwrite"])
    assert not os.path.exists(stale)
