"""Export a framework (orbax) checkpoint as a TF1 TensorBundle.

Reverse of tools/import_tf_checkpoint.py: builds the model from the
model_dir's train-params, loads the latest orbax checkpoint, renames the
Flax tree to the reference's TF1 variable names (models.convert), and
writes `model.ckpt-<step>.{index,data-00000-of-00001}` plus a CheckpointState
file — loadable by the reference's `tf.train.Saver.restore`
(reference eval.py:117-118, resnet.py:238-249 naming).

    python tools/export_to_tf_bundle.py MODEL_DIR OUT_DIR
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("model_dir", help="Framework model dir (train-params + checkpoints)")
    parser.add_argument("out_dir", help="Where to write the model.ckpt-* bundle")
    args = parser.parse_args(argv)

    import jax
    import numpy as np

    from spatialaudiogen_tpu.config import TrainConfig
    from spatialaudiogen_tpu.models import SptAudioGen
    from spatialaudiogen_tpu.models.convert import to_tf_var_dict
    from spatialaudiogen_tpu.train.checkpoint import restore_checkpoint
    from spatialaudiogen_tpu.train.lr import make_optimizer
    from spatialaudiogen_tpu.train.state import create_train_state
    from spatialaudiogen_tpu.utils.tf_bundle import save_tf_checkpoint

    cfg = TrainConfig.load(args.model_dir)
    cfg.model_dir = args.model_dir
    model = SptAudioGen(cfg.model_config())
    g = cfg.model_config().geometry
    example = {"ambix": np.zeros((1, g.snd_size, g.num_ambi_channels), np.float32),
               "audio_mask": np.ones((1, g.num_ambi_channels), np.float32)}
    hw = tuple(cfg.frame_hw)
    if "video" in cfg.encoders:
        example["video"] = np.zeros((1, g.vid_dur) + hw + (3,), np.float32)
    if "flow" in cfg.encoders:
        example["flow"] = np.zeros((1, g.vid_dur) + hw + (3,), np.float32)
    target = create_train_state(model, make_optimizer(), jax.random.PRNGKey(0),
                                example)
    state, step = restore_checkpoint(args.model_dir, target)
    assert step is not None, f"no checkpoint in {args.model_dir}"

    tf_vars = to_tf_var_dict({"params": state.params,
                              "batch_stats": state.batch_stats})
    tf_vars["global_step"] = np.array(step, np.int64)
    os.makedirs(args.out_dir, exist_ok=True)
    prefix = os.path.join(args.out_dir, f"model.ckpt-{step}")
    save_tf_checkpoint(prefix, tf_vars)
    print(f"Exported {len(tf_vars)} variables to {prefix}.*")


if __name__ == "__main__":
    main()
