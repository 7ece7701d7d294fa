"""Activation parity harness: compare model taps against recorded goldens.

Workflow for checkpoint-parity validation against the TF1 reference
(SURVEY §4 "shape/parity tests of each Flax module against recorded
activations"):

  1. On a TF machine, run the reference graph on a saved input batch and
     dump its `ends` tensors (model.py:55) plus the inputs to an npz:
     keys `input/audio`, `input/video`, `input/flow` and one key per tap
     (e.g. `audio_encoder`, `separation`, `decoder/ambix`).
  2. Import the checkpoint here (tools/import_tf_checkpoint.py).
  3. Run this tool: it executes our model on the same inputs and reports
     per-tap max/mean absolute error.

    python tools/compare_activations.py MODEL_DIR GOLDENS_NPZ [--atol 1e-3]

Also usable for self-regression: --record writes OUR activations to the npz
so future changes can be diffed against them.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("model_dir")
    parser.add_argument("goldens_npz")
    parser.add_argument("--atol", type=float, default=1e-3)
    parser.add_argument("--record", action="store_true",
                        help="Write our activations into goldens_npz instead "
                             "of comparing (inputs must already be present, "
                             "or are generated randomly with --seed).")
    parser.add_argument("--seed", type=int, default=0)
    args = parser.parse_args(argv)

    import jax
    import numpy as np

    from spatialaudiogen_tpu.config import TrainConfig
    from spatialaudiogen_tpu.models import SptAudioGen
    from spatialaudiogen_tpu.train.checkpoint import restore_checkpoint
    from spatialaudiogen_tpu.train.lr import make_optimizer
    from spatialaudiogen_tpu.train.state import create_train_state

    cfg = TrainConfig.load(args.model_dir)
    cfg.model_dir = args.model_dir
    model = SptAudioGen(cfg.model_config())
    g = cfg.model_config().geometry

    if os.path.exists(args.goldens_npz):
        blob = dict(np.load(args.goldens_npz))
    else:
        assert args.record, f"{args.goldens_npz} not found (use --record to create)"
        rng = np.random.RandomState(args.seed)
        blob = {"input/audio":
                rng.randn(2, g.snd_size, g.num_in_channels).astype(np.float32) * 0.1}
        if "video" in cfg.encoders:
            blob["input/video"] = rng.rand(
                2, g.vid_dur, *cfg.frame_hw, 3).astype(np.float32) - 0.5
        if "flow" in cfg.encoders:
            blob["input/flow"] = rng.rand(
                2, g.vid_dur, *cfg.frame_hw, 3).astype(np.float32) - 0.5

    tx = make_optimizer()
    example = {"ambix": np.zeros((1, g.snd_size, g.num_ambi_channels), np.float32),
               "audio_mask": np.ones((1, g.num_ambi_channels), np.float32)}
    for k in ("video", "flow"):
        if f"input/{k}" in blob:
            example[k] = np.zeros((1,) + blob[f"input/{k}"].shape[1:], np.float32)
    state = create_train_state(model, tx, jax.random.PRNGKey(0), example)
    state, step = restore_checkpoint(args.model_dir, state)
    assert step is not None, f"no checkpoint in {args.model_dir}"

    variables = {"params": state.params}
    if state.batch_stats:
        variables["batch_stats"] = state.batch_stats
    out, ends = model.apply(variables, blob["input/audio"],
                            blob.get("input/video"), blob.get("input/flow"),
                            train=False, return_ends=True)
    ours = {name: np.asarray(val) for name, val in ends.items()}

    if args.record:
        np.savez(args.goldens_npz, **blob,
                 **{k: v for k, v in ours.items() if not k.startswith("input/")})
        print(f"Recorded {len(ours)} activation taps to {args.goldens_npz}")
        return 0

    failures = 0
    for name, golden in blob.items():
        if name.startswith("input/"):
            continue
        if name not in ours:
            print(f"MISSING tap: {name}")
            failures += 1
            continue
        got = ours[name]
        if got.shape != golden.shape:
            print(f"SHAPE {name}: ours {got.shape} vs golden {golden.shape}")
            failures += 1
            continue
        err = np.abs(got - golden)
        status = "OK " if err.max() <= args.atol else "FAIL"
        if status == "FAIL":
            failures += 1
        print(f"{status} {name:28s} max={err.max():.3e} mean={err.mean():.3e}")
    print(f"{failures} failing taps" if failures else "all taps within tolerance")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
