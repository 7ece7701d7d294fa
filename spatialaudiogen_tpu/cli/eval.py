"""Evaluator CLI — flag parity with reference eval.py:14-26.

    python -m spatialaudiogen_tpu.cli.eval MODEL_DIR [--subset_fn F]
        [--batch_size 16] [--overwrite] [--db_dir D]
"""

from __future__ import annotations

import argparse
import os
import sys


def parse_arguments(argv=None):
    parser = argparse.ArgumentParser(
        description=__doc__, formatter_class=argparse.RawDescriptionHelpFormatter)
    parser.add_argument("model_dir")
    parser.add_argument("--subset_fn", default="")
    parser.add_argument("--batch_size", default=16, type=int)
    parser.add_argument("--overwrite", action="store_true")
    parser.add_argument("--db_dir", default=None,
                        help="Override the dataset dir recorded at training time.")
    parser.add_argument("--emd_ang_res", default=30, type=float)
    parser.add_argument("--device_metrics", action="store_true",
                        help="Compute mel-LSD and envelope distance on the "
                             "TPU as matmuls (ops/eval_metrics.py, matches "
                             "the host implementations to ~1e-6). Together "
                             "with --emd sinkhorn the whole eval battery "
                             "runs on-chip.")
    parser.add_argument("--emd", default="exact", choices=["exact", "sinkhorn"],
                        help="EMD solver: 'exact' = per-sample native "
                             "min-cost flow on the host (reference pyemd "
                             "semantics); 'sinkhorn' = whole-batch annealed "
                             "Sinkhorn on the TPU (ops/sinkhorn.py, ~1e-5 "
                             "absolute agreement, removes the dominant host "
                             "metric cost).")
    parser.add_argument("--n_data", default=None, type=int,
                        help="Shard eval batches over a data-parallel mesh "
                             "of this many devices (default: single device).")
    parser.add_argument("--compute_dtype", default=None,
                        choices=["float32", "bfloat16"],
                        help="Override the training compute dtype, e.g. "
                             "force f32-exact metrics for a --bf16-trained "
                             "model (default: as trained).")
    args = parser.parse_args(argv)
    if len(args.subset_fn) == 0:
        args.subset_fn = None
    return args


def main(argv=None):
    args = parse_arguments(argv)
    eval_fn = os.path.join(args.model_dir, "eval-detailed.txt")
    assert os.path.exists(args.model_dir), "Model dir does not exist."
    # the guard covers per-shard files too: multi-host runs write
    # eval-detailed.txt.shard{K}, and stale shards from a previous run
    # with a different process count would otherwise be silently merged
    # by sag-parse-eval. With --overwrite, clean ALL old shard files so a
    # re-run with fewer processes cannot leave stale ones behind.
    import glob as _glob

    existing = sorted(_glob.glob(eval_fn + "*"))
    assert args.overwrite or not existing, \
        f"Evaluation file(s) already exist: {existing}"
    if args.overwrite:
        import jax as _jax

        if _jax.process_index() == 0:
            for fn in existing:
                os.remove(fn)

    from spatialaudiogen_tpu.eval.evaluator import Evaluator
    from spatialaudiogen_tpu.utils.jax_setup import enable_compile_cache

    enable_compile_cache()
    mesh = None
    if args.n_data is not None and args.n_data > 1:
        from spatialaudiogen_tpu.parallel.mesh import make_mesh

        mesh = make_mesh(n_data=args.n_data, n_model=1)
    evaluator = Evaluator(args.model_dir, subset_fn=args.subset_fn,
                          batch_size=args.batch_size, db_dir=args.db_dir,
                          emd_ang_res=args.emd_ang_res, mesh=mesh,
                          compute_dtype=args.compute_dtype, emd_mode=args.emd,
                          device_metrics=args.device_metrics)
    print(f"Restored checkpoint step {evaluator.restored_step}")
    # output_fn=None -> the evaluator's shard-aware default (multi-host
    # runs write eval-detailed.txt.shard{K} so processes never clobber
    # each other; single-host writes exactly `eval_fn` as guarded above)
    summary, results = evaluator.run(output_fn=None)
    print(f"\nEvaluated {len(results)} samples")
    for key, value in summary.items():
        print(f"EVAL | {key}: {value:f}")
    sys.stdout.flush()


if __name__ == "__main__":
    main()
