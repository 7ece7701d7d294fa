"""Import an exported TF1-variable npz into a framework checkpoint.

Counterpart of tools/export_tf_checkpoint.py: builds the model from the
model_dir's train-params, maps the TF variable names onto the Flax tree
(models.convert), and writes an orbax checkpoint that eval/deploy load.

    python tools/import_tf_checkpoint.py MODEL_DIR VARS_NPZ [--step 0]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("model_dir", help="Target model dir (with train-params)")
    parser.add_argument("vars_npz", help="npz from export_tf_checkpoint.py")
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

    blobs = dict(np.load(args.vars_npz))
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
