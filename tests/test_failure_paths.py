"""Failure-detection behaviors: NaN abort, feeder starvation, parity tool."""

import os
import subprocess
import sys

import numpy as np
import pytest

from spatialaudiogen_tpu.config import TrainConfig
from spatialaudiogen_tpu.data.pipeline import Feeder
from spatialaudiogen_tpu.data.synthetic import make_synthetic_dataset
from spatialaudiogen_tpu.train.trainer import Trainer


def test_nan_abort(tmp_path):
    """A diverging run must raise FloatingPointError (train.py:212-213)."""
    db = str(tmp_path / "db")
    make_synthetic_dataset(db, n_videos=1, duration=3.0, frame_hw=(32, 64), seed=2)
    cfg = TrainConfig(db_dir=db, model_dir=str(tmp_path / "m"), encoders=("audio",),
                      separation="none", n_iters=6, batch_size=2, n_workers=1,
                      log_every=1, ckpt_every=0, n_data=1, lr=1e20)  # absurd lr
    trainer = Trainer(cfg)
    with pytest.raises(FloatingPointError):
        trainer.train()
    # the final checkpoint still gets saved on the way out (train.py:230-234)
    assert os.path.exists(os.path.join(cfg.model_dir, "checkpoints"))


def test_feeder_starvation_error(tmp_path):
    """All-silent training data must fail loudly, not hang."""
    db = str(tmp_path / "silent")
    make_synthetic_dataset(db, n_videos=1, duration=3.0, frame_hw=(32, 64), seed=3)
    # rewrite the power index to below-threshold silence
    pow_fn = os.path.join(db, "synth000", "audio_pow.lst")
    lines = [line.split() for line in open(pow_fn)]
    with open(pow_fn, "w") as f:
        for t, _ in lines:
            f.write(f"{t} 0.0001\n")
    feeder = Feeder(db, batch_size=2, n_workers=1, for_eval=False, return_video=False)
    feeder.start()
    with pytest.raises(RuntimeError, match="starved"):
        next(feeder.batches())
    feeder.stop()


def test_activation_parity_tool_self_roundtrip(tmp_path):
    """--record then compare against itself must report zero failures."""
    db = str(tmp_path / "db")
    make_synthetic_dataset(db, n_videos=1, duration=3.0, frame_hw=(32, 64), seed=4)
    model_dir = str(tmp_path / "m")
    cfg = TrainConfig(db_dir=db, model_dir=model_dir, encoders=("audio",),
                      separation="none", n_iters=2, batch_size=2, n_workers=1,
                      log_every=5, ckpt_every=0, n_data=1)
    Trainer(cfg).train()

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
    import compare_activations

    goldens = str(tmp_path / "goldens.npz")
    rc = compare_activations.main([model_dir, goldens, "--record"])
    assert rc == 0 and os.path.exists(goldens)
    rc = compare_activations.main([model_dir, goldens, "--atol", "1e-5"])
    assert rc == 0


def test_feeder_worker_death_raises(tmp_path):
    """A dying worker (e.g. corrupt media) must surface in batches() as a
    RuntimeError — not a silent train-mode hang or a truncated eval pass."""
    db = str(tmp_path / "deathdb")
    make_synthetic_dataset(db, n_videos=2, duration=2.0, frame_hw=(32, 64), seed=6)
    # corrupt one video's ambix wav so its SampleReader raises mid-pass
    bad = os.path.join(db, "synth001", "ambix", "000000.wav")
    with open(bad, "wb") as f:
        f.write(b"RIFFgarbage")
    feeder = Feeder(db, ambi_order=1, audio_rate=48000, video_rate=10,
                    context=1.0, duration=0.1, return_video=False,
                    batch_size=2, n_workers=2, for_eval=True)
    feeder.start()
    try:
        with pytest.raises(RuntimeError, match="feeder worker"):
            for _ in feeder.batches():
                pass
    finally:
        feeder.stop()
