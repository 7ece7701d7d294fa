"""Import a TF1 checkpoint (or exported npz) into a framework checkpoint.

Builds the model from the model_dir's train-params, maps the TF variable
names onto the Flax tree (models.convert), and writes an orbax checkpoint
that eval/deploy load. Accepts either:

  * a released TF1 TensorBundle directly — a `model.ckpt-N` prefix, its
    `.index` file, or a directory holding one (reference README.md:70-78) —
    read TF-free by spatialaudiogen_tpu.utils.tf_bundle, or
  * an npz from tools/export_tf_checkpoint.py (legacy two-step path).

    python tools/import_tf_checkpoint.py MODEL_DIR CKPT_OR_NPZ [--step 0]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("model_dir", help="Target model dir (with train-params)")
    parser.add_argument("checkpoint",
                        help="TF1 model.ckpt-N prefix / .index / dir, or an "
                             "npz from export_tf_checkpoint.py")
    parser.add_argument("--step", type=int, default=0)
    parser.add_argument("--allow_unmatched", action="store_true",
                        help="Do not fail when some TF variables stay unmatched.")
    args = parser.parse_args(argv)

    import jax
    import numpy as np

    from spatialaudiogen_tpu.config import TrainConfig
    from spatialaudiogen_tpu.models import SptAudioGen
    from spatialaudiogen_tpu.models.convert import restore_tf_var_dict
    from spatialaudiogen_tpu.train.checkpoint import save_checkpoint
    from spatialaudiogen_tpu.train.lr import make_optimizer
    from spatialaudiogen_tpu.train.state import TrainState, create_train_state

    cfg = TrainConfig.load(args.model_dir)
    cfg.model_dir = args.model_dir
    model = SptAudioGen(cfg.model_config())
    tx = make_optimizer()
    g = cfg.model_config().geometry
    example = {"ambix": np.zeros((1, g.snd_size, g.num_ambi_channels), np.float32),
               "audio_mask": np.ones((1, g.num_ambi_channels), np.float32)}
    hw = tuple(cfg.frame_hw)
    if "video" in cfg.encoders:
        example["video"] = np.zeros((1, g.vid_dur) + hw + (3,), np.float32)
    if "flow" in cfg.encoders:
        example["flow"] = np.zeros((1, g.vid_dur) + hw + (3,), np.float32)
    state = create_train_state(model, tx, jax.random.PRNGKey(0), example)

    if args.checkpoint.endswith((".npz", ".npy")):
        blobs = dict(np.load(args.checkpoint, allow_pickle=True))
    else:
        from spatialaudiogen_tpu.utils.tf_bundle import load_tf_checkpoint

        blobs = load_tf_checkpoint(args.checkpoint)
        # drop optimizer slots / bookkeeping the exporter also filters
        blobs = {k: v for k, v in blobs.items()
                 if not k.split("/")[-1].startswith(
                     ("Adam", "beta1_power", "beta2_power"))
                 and k not in ("step", "global_step")}
    variables = {"params": state.params, "batch_stats": state.batch_stats}
    new_vars, unmatched = restore_tf_var_dict(blobs, variables)
    print(f"Matched {len(blobs) - len(unmatched)}/{len(blobs)} TF variables")
    if unmatched:
        for name, shape in sorted(unmatched.items()):
            print(f"  unmatched: {name} {shape}")
        if not args.allow_unmatched:
            sys.exit("Unmatched variables; re-run with --allow_unmatched to accept.")

    state = TrainState(step=state.step, params=new_vars["params"],
                       batch_stats=new_vars.get("batch_stats", {}),
                       opt_state=state.opt_state)
    save_checkpoint(args.model_dir, state, args.step)
    print(f"Wrote checkpoint step {args.step} to {args.model_dir}/checkpoints")


if __name__ == "__main__":
    main()
