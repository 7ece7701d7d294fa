"""Export a reference TF1 checkpoint to an npz of {tf_var_name: array}.

The released spatialaudiogen checkpoints (reference README.md:70-78) are TF1
`model.ckpt*` bundles. This repo has no TensorFlow, so conversion is split:

  1. On ANY machine with tensorflow installed (TF1 or TF2):
         python tools/export_tf_checkpoint.py /path/to/model_dir out.npz
     (reads the latest checkpoint via tf.train, writes a plain npz)
  2. Here, load the npz into a Flax model with
     spatialaudiogen_tpu.models.convert.restore_tf_var_dict — module names
     mirror the TF scopes so the normalized-path mapping is 1:1.

Also exports resnet18.npy-style blobs unchanged (they are already flat
name->array dicts).
"""

from __future__ import annotations

import argparse
import sys


def export(model_dir: str, output_fn: str):
    import numpy as np

    try:
        import tensorflow as tf
    except ImportError:
        sys.exit("This tool needs tensorflow (any version with tf.train "
                 "checkpoint readers). Run it where TF is installed; the "
                 "npz it produces is what spatialaudiogen_tpu consumes.")

    try:  # TF2 API
        reader = tf.train.load_checkpoint(model_dir)
        names = list(reader.get_variable_to_shape_map())
        blobs = {name: reader.get_tensor(name) for name in names}
    except Exception:  # pragma: no cover - TF1 fallback
        from tensorflow.python import pywrap_tensorflow

        ckpt = tf.train.latest_checkpoint(model_dir)
        reader = pywrap_tensorflow.NewCheckpointReader(ckpt)
        blobs = {name: reader.get_tensor(name)
                 for name in reader.get_variable_to_shape_map()}

    # drop optimizer slots; keep model variables only
    blobs = {k: v for k, v in blobs.items()
             if not k.split("/")[-1].startswith(("Adam", "beta1_power", "beta2_power"))
             and k != "step"}
    np.savez(output_fn, **blobs)
    print(f"Exported {len(blobs)} variables to {output_fn}")


def main(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("model_dir", help="TF1 model dir (contains model.ckpt*)")
    parser.add_argument("output_fn", help="Output .npz path")
    args = parser.parse_args(argv)
    export(args.model_dir, args.output_fn)


if __name__ == "__main__":
    main()
