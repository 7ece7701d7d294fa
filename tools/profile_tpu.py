"""Profile the flagship forward / train step on the TPU and print a per-op
time breakdown parsed from the jax.profiler trace.

    python tools/profile_tpu.py fwd   [--batch 128] [--bf16]
    python tools/profile_tpu.py train [--batch 32]  [--bf16]

Timing caveat (axon tunnel): block_until_ready does not reliably block, so
each timed region ends with a device-scalar fetch; the profiler trace itself
records device-side op durations, which is what the breakdown reports.
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


def build_fwd(batch: int, bf16: bool):
    import jax
    import jax.numpy as jnp

    from spatialaudiogen_tpu.models import SptAudioGen, SptAudioGenConfig

    cfg = SptAudioGenConfig(encoders=("audio", "video"), separation="unet_mask",
                            dtype=jnp.bfloat16 if bf16 else None)
    g = cfg.geometry
    model = SptAudioGen(cfg)
    rng = np.random.RandomState(0)
    audio = rng.randn(batch, g.snd_size, g.num_in_channels).astype(np.float32) * 0.1
    video = (rng.rand(batch, g.vid_dur, 224, 448, 3).astype(np.float32) - 0.5)
    variables = jax.jit(
        lambda a, v: model.init(jax.random.PRNGKey(0), a, v, train=False)
    )(audio[:1], video[:1])
    fn = jax.jit(lambda vs, a, v: jnp.sum(model.apply(vs, a, v, train=False) ** 2))
    args = (variables, jax.device_put(audio), jax.device_put(video))
    return fn, args


def build_train(batch: int, bf16: bool):
    import jax
    import jax.numpy as jnp

    from spatialaudiogen_tpu.models import SptAudioGen, SptAudioGenConfig
    from spatialaudiogen_tpu.train import create_train_state, make_train_step
    from spatialaudiogen_tpu.train.lr import make_optimizer

    cfg = SptAudioGenConfig(encoders=("audio", "video"), separation="unet_mask",
                            dtype=jnp.bfloat16 if bf16 else None)
    g = cfg.geometry
    model = SptAudioGen(cfg)
    rng = np.random.RandomState(0)
    ex = {
        "ambix": rng.randn(batch, g.snd_size, g.num_ambi_channels).astype(np.float32) * 0.1,
        "audio_mask": np.ones((batch, g.num_ambi_channels), np.float32),
        "video": rng.rand(batch, g.vid_dur, 224, 448, 3).astype(np.float32) - 0.5,
    }
    state = create_train_state(model, make_optimizer(), jax.random.PRNGKey(0), ex)
    step = jax.jit(make_train_step(model, make_optimizer()))

    def fn(state, batch_):
        state, metrics = step(state, batch_)
        return state, metrics["total_loss"]

    return jax.jit(fn), (state, jax.device_put(ex))


def parse_trace(trace_dir: str, top: int = 30):
    files = glob.glob(os.path.join(trace_dir, "**", "*.trace.json.gz"),
                      recursive=True)
    assert files, f"no trace files under {trace_dir}"
    fn = max(files, key=os.path.getmtime)
    with gzip.open(fn, "rt") as f:
        trace = json.load(f)
    events = trace.get("traceEvents", [])
    # device op lanes: pid/tid whose thread name mentions XLA Ops. Restrict
    # to ONE device (the first pid with such a lane) so multi-chip hosts
    # don't inflate the total N-fold across replicas.
    lane_names = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "thread_name":
            lane_names[(e.get("pid"), e.get("tid"))] = e["args"].get("name", "")
    op_pids = sorted({pid for (pid, _), name in lane_names.items()
                      if "XLA Ops" in name})
    assert op_pids, ("no 'XLA Ops' lane in the trace — device events missing "
                     "or the plugin names lanes differently; refusing to "
                     "report a bogus 0 ms")
    if len(op_pids) > 1:
        print(f"note: {len(op_pids)} device lanes in trace; "
              f"reporting pid {op_pids[0]} only")
    by_op = defaultdict(float)
    count = defaultdict(int)
    total = 0.0
    for e in events:
        if e.get("ph") != "X":
            continue
        if e.get("pid") != op_pids[0]:
            continue
        if "XLA Ops" not in lane_names.get((e.get("pid"), e.get("tid")), ""):
            continue
        dur = e.get("dur", 0) / 1e3  # us -> ms
        name = e.get("name", "?")
        by_op[name] += dur
        count[name] += 1
        total += dur
    rows = sorted(by_op.items(), key=lambda kv: -kv[1])[:top]
    print(f"\ndevice op total: {total:.2f} ms across all iterations\n")
    print(f"{'ms':>9}  {'%':>5}  {'n':>5}  op")
    for name, ms in rows:
        print(f"{ms:9.2f}  {100 * ms / total:5.1f}  {count[name]:5d}  {name[:110]}")
    return total


def build_deploy_span(batch: int, bf16: bool):
    """The deploy fast path's jitted span-forward (on-device window gather,
    audio-only bench model): profiles the e2e bench's compute term."""
    import jax

    from spatialaudiogen_tpu.deploy.deploy import MonoToAmbix

    model_dir = os.path.join(_REPO, ".bench_e2e", "model_audio")
    assert os.path.isdir(model_dir), "run bench.py once to create the model"
    m = MonoToAmbix(model_dir, batch_size=batch,
                    compute_dtype="bfloat16" if bf16 else None)
    g = m.geometry
    span_len = (batch - 1) * g.snd_dur + g.snd_size + 16
    rng = np.random.RandomState(0)
    span = rng.randint(-2000, 2000,
                       (span_len, g.num_in_channels)).astype(np.int16)
    rel = (np.arange(batch) * g.snd_dur).astype(np.int32)  # all lanes valid
    args = (m.state, jax.device_put(span), jax.device_put(rel), None)
    return m.fwd_span, args


def main():
    p = argparse.ArgumentParser()
    p.add_argument("mode", choices=["fwd", "train", "deploy_span"])
    p.add_argument("--batch", type=int, default=None)
    p.add_argument("--bf16", action="store_true")
    p.add_argument("--iters", type=int, default=5)
    p.add_argument("--trace_dir", default="/tmp/sag_trace")
    args = p.parse_args()

    import jax

    jax.config.update("jax_compilation_cache_dir", os.path.join(_REPO, ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

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
    total = parse_trace(args.trace_dir)
    print(f"\nper-iteration device time: {total / args.iters:.2f} ms "
          f"({args.mode}, batch {batch}, {'bf16' if args.bf16 else 'f32'})")


if __name__ == "__main__":
    main()
