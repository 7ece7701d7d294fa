"""Measure multi-session streaming serving throughput (StreamBatcher).

    python tools/bench_serve.py [--capacity 16] [--seconds 30] [--model DIR]

Drives `capacity` concurrent synthetic sessions through one StreamBatcher:
every logical 0.1 s, each session pushes 4800 new mono samples and the
batcher runs ONE batched forward (device-resident rolling contexts, so the
tick ships only capacity x 0.1 s of audio up and capacity x (4800, 3) f16
predictions down). Reports per-tick latency percentiles and the verdict:
`capacity` sessions hold realtime iff p99 tick latency < 100 ms.

Uses the bench audio-only model (.bench_e2e/model_audio, created by
bench.py); --video switches to the flagship audio+RGB model
(.bench_e2e/model) and pushes one synthetic 224x448 uint8 frame per
session per tick (the dominant extra H2D: ~0.3 MB/session/tick). Timing
is verified-sync: every tick ends with the host fetch of the tick's
predictions (np.asarray inside tick), which on the in-order axon queue
waits for the whole tick's work.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--capacity", type=int, default=16)
    p.add_argument("--seconds", type=float, default=30.0,
                   help="simulated audio seconds per session")
    p.add_argument("--model", default=None)
    p.add_argument("--video", action="store_true",
                   help="use the flagship audio+RGB bench model and push "
                        "one 224x448 frame per session per tick")
    p.add_argument("--n_data", type=int, default=None,
                   help="shard the tick over N chips (mesh data axis)")
    p.add_argument("--i420", action="store_true",
                   help="push frames as raw 4:2:0 planes (half the bytes; "
                        "the form live YUV sources produce)")
    args = p.parse_args()
    if args.model is None:
        args.model = os.path.join(
            _REPO, ".bench_e2e", "model" if args.video else "model_audio")

    import jax

    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(_REPO, ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from spatialaudiogen_tpu.deploy.stream import StreamBatcher

    assert os.path.isdir(args.model), \
        f"{args.model} missing - run bench.py once to create it"
    mesh = None
    if args.n_data and args.n_data > 1:
        from spatialaudiogen_tpu.parallel.mesh import make_mesh

        mesh = make_mesh(n_data=args.n_data, n_model=1)
    b = StreamBatcher(args.model, capacity=args.capacity, mesh=mesh)
    sids = [b.add_session() for _ in range(args.capacity)]
    rng = np.random.RandomState(0)
    signals = rng.randn(args.capacity, int(48000 * (args.seconds + 1.2))) \
        .astype(np.float32) * 0.1
    needs_video = "video" in b.cfg.encoders
    hw = tuple(b.cfg.frame_hw)
    frames = (rng.randint(0, 255, (args.capacity,) + hw + (3,), np.uint8)
              if needs_video else None)
    if needs_video and args.i420:
        from spatialaudiogen_tpu.deploy.deploy import host_rgb_to_i420

        frames = np.stack([host_rgb_to_i420(f[None])[0] for f in frames])

    def frame_of(i):
        # fresh-ish content per tick without a decode in the timed loop:
        # roll the session's base frame (content doesn't affect timing)
        return None if frames is None else frames[i]

    # prime: fill each session's first window (context) + compile the tick
    warm = 52799 + 4800
    for i, sid in enumerate(sids):
        b.push(sid, signals[i, :warm])
        if needs_video:
            for _ in range(-(-warm // 4800)):  # one frame per 0.1 s pushed
                b.push(sid, None, frame_of(i))
    t0 = time.perf_counter()
    out = b.tick()
    print(f"first tick (compile/warm): {time.perf_counter() - t0:.1f}s, "
          f"{sum(map(len, out.values()))} chunks")

    n_ticks = int(args.seconds * 10) - 14
    lat = []
    pos = warm
    emitted = 0
    for t in range(n_ticks):
        for i, sid in enumerate(sids):
            b.push(sid, signals[i, pos: pos + 4800], frame_of(i))
        pos += 4800
        t0 = time.perf_counter()
        out = b.tick()
        lat.append(time.perf_counter() - t0)
        emitted += sum(map(len, out.values()))
    lat_ms = np.array(lat) * 1e3
    p50, p90, p99 = np.percentile(lat_ms, [50, 90, 99])
    realtime = p99 < 100.0
    print(f"capacity={args.capacity}: {n_ticks} ticks, {emitted} chunks "
          f"({emitted / args.capacity / 10:.1f} s/session)")
    print(f"tick latency ms: p50={p50:.1f} p90={p90:.1f} p99={p99:.1f} "
          f"max={lat_ms.max():.1f}")
    print(f"sessions-at-realtime verdict: {args.capacity} sessions "
          f"{'HOLD' if realtime else 'MISS'} the 100 ms/window budget "
          f"(p99 {p99:.1f} ms)")


if __name__ == "__main__":
    main()
