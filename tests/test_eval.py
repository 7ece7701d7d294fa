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
