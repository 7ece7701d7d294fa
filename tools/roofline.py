"""Per-op roofline of the flagship step on the TPU: where the time goes,
and for each op whether it is compute- or bandwidth-bound and how close it
runs to that bound.

    python tools/roofline.py train --batch 128 --bf16 [--json out.json]
    python tools/roofline.py fwd   --batch 128 --bf16

Method: the TPU profiler trace annotates every device op event with
`model_flops` and `bytes_accessed` (and `device_duration_ps`). Aggregating
those per op name gives, for each op, achieved FLOP/s and B/s; the roofline
bound is then max(flops / MXU_peak, bytes / HBM_BW) and `eff` is that bound
over the measured time — eff near 1.0 means the op runs at the hardware
limit and only an algorithmic change (fewer flops / fewer bytes) can speed
it up. Peaks: v5e 197 TFLOP/s bf16 MXU, 819 GB/s HBM. Default-precision
f32 convs/dots execute as bf16 multiplies with f32 accumulation on the MXU,
so the bf16 peak is the right roof for them too; the model's
precision=highest DFT matmuls (6-pass) will honestly show low eff against
it. Pallas custom-calls carry no flops/bytes metadata in the trace — their
rows show 0 and are costed by hand in PERF.md.

This is the evidence behind PERF.md's MFU-ceiling section (VERDICT r4 #3):
the measured step MFU is low not because big matmuls run slowly but because
the model's FLOPs are concentrated in ops that are bandwidth-bound at these
shapes.
"""

from __future__ import annotations

import argparse
import glob
import gzip
import json
import os
import sys
from collections import defaultdict

import numpy as np

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)

V5E_BF16_PEAK = 197e12   # FLOP/s (bench.py uses the same constant)
V5E_HBM_BW = 819e9       # B/s


def collect_ops(trace_dir: str, iters: int):
    """Aggregate per-op-name stats from the newest trace under trace_dir."""
    files = glob.glob(os.path.join(trace_dir, "**", "*.trace.json.gz"),
                      recursive=True)
    assert files, f"no trace files under {trace_dir}"
    fn = max(files, key=os.path.getmtime)
    with gzip.open(fn, "rt") as f:
        trace = json.load(f)
    events = trace.get("traceEvents", [])
    lane_names = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "thread_name":
            lane_names[(e.get("pid"), e.get("tid"))] = e["args"].get("name", "")
    op_pids = sorted({pid for (pid, _), name in lane_names.items()
                      if "XLA Ops" in name})
    assert op_pids, "no 'XLA Ops' lane in the trace"
    ops = defaultdict(lambda: {"ms": 0.0, "flops": 0.0, "bytes": 0.0,
                               "n": 0, "category": "", "long_name": ""})
    t0, t1 = np.inf, -np.inf
    for e in events:
        if e.get("ph") != "X" or e.get("pid") != op_pids[0]:
            continue
        if "XLA Ops" not in lane_names.get((e.get("pid"), e.get("tid")), ""):
            continue
        a = e.get("args") or {}
        cat = a.get("hlo_category", "")
        # async/copy start+done pairs bracket DMAs that overlap compute;
        # their durations aren't additive with the compute lane. Track them
        # separately under a synthetic <dma> row.
        name = e.get("name", "?")
        if cat in ("async-start", "async-done", "copy-start", "copy-done"):
            name = "<dma overlap (async/copy pairs)>"
        o = ops[name]
        o["ms"] += e.get("dur", 0) / 1e3
        o["flops"] += float(a.get("model_flops", 0) or 0)
        o["bytes"] += float(a.get("bytes_accessed", 0) or 0)
        o["n"] += 1
        o["category"] = cat
        if not o["long_name"]:
            o["long_name"] = a.get("long_name", "")[:160]
        t0 = min(t0, e.get("ts", np.inf))
        t1 = max(t1, e.get("ts", -np.inf) + e.get("dur", 0) / 1e3)
    span_ms = (t1 - t0) / iters
    for o in ops.values():
        for k in ("ms", "flops", "bytes"):
            o[k] /= iters
    return ops, span_ms


def roofline_rows(ops, bf16: bool, top: int):
    """Per-op achieved rates vs the v5e roofline, sorted by time."""
    rows = []
    for name, o in ops.items():
        ms = o["ms"]
        if ms <= 0:
            continue
        t = ms / 1e3
        peak = V5E_BF16_PEAK
        bound_s = max(o["flops"] / peak, o["bytes"] / V5E_HBM_BW)
        rows.append({
            "op": name, "category": o["category"], "n": o["n"],
            "ms": round(ms, 3),
            "gflops": round(o["flops"] / 1e9, 2),
            "mbytes": round(o["bytes"] / 1e6, 2),
            "tflops_per_s": round(o["flops"] / t / 1e12, 2),
            "gbytes_per_s": round(o["bytes"] / t / 1e9, 1),
            "bound": ("compute" if o["flops"] / peak > o["bytes"] / V5E_HBM_BW
                      else "bandwidth"),
            "roofline_ms": round(bound_s * 1e3, 3),
            "eff": round(bound_s / t, 3) if t else 0.0,
            "long_name": o["long_name"],
        })
    rows.sort(key=lambda r: -r["ms"])
    # unused signature arg kept for call-site clarity; one roof for all
    del bf16
    return rows[:top]


def main():
    p = argparse.ArgumentParser()
    p.add_argument("mode", choices=["fwd", "train", "deploy_span"])
    p.add_argument("--batch", type=int, default=None)
    p.add_argument("--bf16", action="store_true")
    p.add_argument("--iters", type=int, default=5)
    p.add_argument("--top", type=int, default=25)
    p.add_argument("--trace_dir", default="/tmp/sag_roofline")
    p.add_argument("--json", default=None, help="also dump rows as JSON")
    args = p.parse_args()

    import jax

    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(_REPO, ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from tools.profile_tpu import build_deploy_span, build_fwd, build_train

    batch = args.batch or (32 if args.mode == "train" else 128)
    builder = {"fwd": build_fwd, "train": build_train,
               "deploy_span": build_deploy_span}[args.mode]
    fn, fargs = builder(batch, args.bf16)

    out = fn(*fargs)
    leaf = jax.tree_util.tree_leaves(out)[-1]
    print("warm:", float(np.asarray(leaf).ravel()[0]))

    os.makedirs(args.trace_dir, exist_ok=True)
    with jax.profiler.trace(args.trace_dir):
        for _ in range(args.iters):
            out = fn(*fargs)
        leaf = jax.tree_util.tree_leaves(out)[-1]
        _ = float(np.asarray(leaf).ravel()[0])

    ops, span_ms = collect_ops(args.trace_dir, args.iters)
    rows = roofline_rows(ops, args.bf16, args.top)
    # the lane min->max span includes host gaps between dispatches; the
    # additive device-busy time is the step-time denominator (same
    # convention as tools/profile_tpu.py)
    busy = sum(o["ms"] for n, o in ops.items() if not n.startswith("<dma"))
    span_ms = busy
    flops = sum(o["flops"] for o in ops.values())
    bts = sum(o["bytes"] for n, o in ops.items() if not n.startswith("<dma"))
    print(f"\n{args.mode} batch {batch} {'bf16' if args.bf16 else 'f32'}: "
          f"device busy {busy:.2f} ms/iter, "
          f"{flops / 1e9:.1f} GFLOP, {bts / 1e6:.1f} MB touched")
    print(f"aggregate: {flops / (busy / 1e3) / 1e12:.2f} TFLOP/s "
          f"({100 * flops / (busy / 1e3) / V5E_BF16_PEAK:.1f}% of bf16 peak), "
          f"{bts / (busy / 1e3) / 1e9:.0f} GB/s "
          f"({100 * bts / (busy / 1e3) / V5E_HBM_BW:.1f}% of HBM)")
    hdr = (f"{'ms':>8} {'%step':>5} {'n':>4} {'GFLOP':>8} {'MB':>8} "
           f"{'TF/s':>6} {'GB/s':>6} {'bound':>9} {'eff':>5}  op")
    print("\n" + hdr)
    for r in rows:
        print(f"{r['ms']:8.3f} {100 * r['ms'] / span_ms:5.1f} {r['n']:4d} "
              f"{r['gflops']:8.2f} {r['mbytes']:8.2f} {r['tflops_per_s']:6.2f} "
              f"{r['gbytes_per_s']:6.1f} {r['bound']:>9} {r['eff']:5.2f}  "
              f"{r['op'][:60]}")
    if args.json:
        with open(args.json, "w") as f:
            json.dump({"mode": args.mode, "batch": batch, "bf16": args.bf16,
                       "span_ms_per_iter": span_ms, "busy_ms": busy,
                       "gflop_per_iter": flops / 1e9, "rows": rows}, f,
                      indent=1)
        print(f"\nwrote {args.json}")


if __name__ == "__main__":
    main()
