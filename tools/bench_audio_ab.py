"""Audio-only deploy batch-size A/B with sub-cliff chunked D2H fetches.

Round-3 measured (single-RPC prediction fetch) batch 128/256/384/512 at
32/55/58/32x on the 595 s clip: past ~11 MB the one f16 prediction fetch
fell off the tunnel's D2H cliff, capping 384/512. Round 4's deploy engine
splits the fetch into <=8 MB parts (deploy/deploy.py d2h_chunk_bytes), so
this sweep re-measures the same four batch sizes in one sitting, with
per-direction link probes interleaved so a congestion wave is visible in
the record rather than silently corrupting one point.

Usage: python tools/bench_audio_ab.py [--runs N] [--batches 128,256,...]
Prints one JSON line per batch size plus a final summary line.
"""

import argparse
import json
import os
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)

import bench  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--runs", type=int, default=2)
    ap.add_argument("--batches", default="128,256,384,512")
    ap.add_argument("--chunk_mb", type=float, default=8.0,
                    help="d2h_chunk_bytes in MB (0 = unchunked single RPC)")
    args = ap.parse_args()

    import jax
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(_REPO, ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    _, audio_db_dir, _, audio_model_dir = bench._ensure_e2e_model_dir()
    clip = os.path.join(audio_db_dir, "synth000")
    deploy_seconds = bench.E2E_AUDIO_CLIP_SECONDS - 5.0

    from spatialaudiogen_tpu.deploy.deploy import MonoToAmbix

    chunk_bytes = int(args.chunk_mb * (1 << 20)) or (1 << 62)
    rows = []
    for b in (int(x) for x in args.batches.split(",")):
        h2d_bw, h2d_lat = bench.measure_h2d_link()
        d2h_bw, d2h_lat = bench.measure_d2h_link()
        model = MonoToAmbix(audio_model_dir, batch_size=b,
                            d2h_chunk_bytes=chunk_bytes)
        out = model.deploy(clip, 0.5, deploy_seconds)  # compile + warm
        audio_secs = out.shape[0] / model.cfg.audio_rate
        best = float("inf")
        for _ in range(args.runs):
            t0 = time.perf_counter()
            model.deploy(clip, 0.5, deploy_seconds)
            best = min(best, time.perf_counter() - t0)
        pred_mb = b * 4800 * 3 * 2 / 1e6  # f16 prediction bytes per batch
        row = {
            "batch": b, "realtime": round(audio_secs / best, 1),
            "pred_mb_per_batch": round(pred_mb, 2),
            "n_fetch_parts": max(1, -(-int(pred_mb * 1e6) // chunk_bytes)),
            "h2d_mb_per_s": round(h2d_bw, 1), "d2h_mb_per_s": round(d2h_bw, 1),
            "h2d_lat_s": round(h2d_lat, 4), "d2h_lat_s": round(d2h_lat, 4),
        }
        rows.append(row)
        print(json.dumps(row), flush=True)
        del model
    print(json.dumps({"summary": {r["batch"]: r["realtime"] for r in rows},
                      "chunk_mb": args.chunk_mb, "runs": args.runs}),
          flush=True)


if __name__ == "__main__":
    main()
