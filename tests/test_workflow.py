"""Full workflow integration: synth data -> train CLI -> eval CLI ->
parse results -> deploy -> mux dry-run. Exercises the user-facing surface
end-to-end the way the reference README walks through its pipeline."""

import json
import os

import numpy as np
import pytest

from spatialaudiogen_tpu.data.synthetic import make_synthetic_dataset
from spatialaudiogen_tpu.utils.io_audio import load_wav, save_wav


@pytest.fixture(scope="module")
def workspace(tmp_path_factory):
    ws = tmp_path_factory.mktemp("workflow")
    db = str(ws / "db")
    make_synthetic_dataset(db, n_videos=2, duration=3.0, frame_hw=(64, 128), seed=21)
    return ws, db


def test_full_workflow(workspace):
    ws, db = workspace
    model_dir = str(ws / "model")

    # --- train via CLI ---
    from spatialaudiogen_tpu.cli.train import main as train_main

    train_main([db, model_dir, "--encoders", "audio", "--separation", "none",
                "--n_iters", "3", "--batch_size", "4", "--n_workers", "2",
                "--ckpt_every", "0", "--frame_hw", "64", "128", "--n_data", "1"])
    assert os.path.exists(os.path.join(model_dir, "train-params.json"))
    assert os.path.exists(os.path.join(model_dir, "checkpoints"))

    # --- eval via CLI ---
    from spatialaudiogen_tpu.cli.eval import main as eval_main

    eval_main([model_dir, "--batch_size", "3", "--db_dir", db,
               "--emd_ang_res", "36"])
    detailed = os.path.join(model_dir, "eval-detailed.txt")
    assert os.path.exists(detailed)
    assert len(open(detailed).read().splitlines()) == 1 + 4  # header + samples

    # --- aggregate ---
    from spatialaudiogen_tpu.eval.parse_results import aggregate

    agg = aggregate(detailed)
    assert all(np.isfinite(v) for v in agg.values())

    # --- deploy (library call; CLI wraps ffmpeg for the mux half) ---
    from spatialaudiogen_tpu.deploy.deploy import MonoToAmbix

    model = MonoToAmbix(model_dir, batch_size=4)
    ambi = model.deploy(os.path.join(db, "synth000"), 0.5, 1.0)
    assert ambi.shape == (48000, 4)
    out_wav = str(ws / "pred.wav")
    save_wav(out_wav, ambi, 48000)
    back, rate = load_wav(out_wav)
    assert rate == 48000 and back.shape == (48000, 4)

    # --- mux command plan + SA3D injection dry run ---
    from spatialaudiogen_tpu.deploy.mux import gen_360video

    log = gen_360video(out_wav, "video.mp4", str(ws / "out.mp4"),
                       inject_meta=True, dry_run=True)
    assert any("inject_spatial_metadata" in line for line in log)

    # --- eval overwrite guard (reference eval.py:32) ---
    with pytest.raises(AssertionError):
        eval_main([model_dir, "--db_dir", db])
