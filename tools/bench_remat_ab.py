"""On-chip A/B: train-step throughput with and without activation remat.

The round-5 roofline (PERF.md) established the batch-128 train step is
HBM-bandwidth-bound (byte floor 2-3x the FLOP floor). `SptAudioGenConfig.remat`
wraps the audio encoder, ResNet trunk and separation U-Net in nn.remat, which
trades ~1/3 extra forward FLOPs for not storing their activations across the
fwd/bwd boundary — on a bandwidth-bound step that exchange can go either way,
so it has to be measured, not argued. Timing follows the verified-sync
convention (CLAUDE.md): fetch a device scalar to sync; the execution queue is
in-order.

Usage: python tools/bench_remat_ab.py [--batch 128] [--iters 20] [--f32]
"""
import argparse
import json
import os
import sys
import time

import numpy as np

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)


def build_train(batch: int, bf16: bool, remat: bool):
    import jax
    import jax.numpy as jnp

    from spatialaudiogen_tpu.models import SptAudioGen, SptAudioGenConfig
    from spatialaudiogen_tpu.train import create_train_state, make_train_step
    from spatialaudiogen_tpu.train.lr import make_optimizer

    cfg = SptAudioGenConfig(encoders=("audio", "video"), separation="unet_mask",
                            dtype=jnp.bfloat16 if bf16 else None, remat=remat)
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


def measure(batch: int, bf16: bool, remat: bool, iters: int):
    import jax

    fn, args = build_train(batch, bf16, remat)
    t0 = time.perf_counter()
    compiled = fn.lower(*args).compile()
    compile_s = time.perf_counter() - t0
    try:
        flops = float(compiled.cost_analysis()["flops"])
    except Exception:
        flops = float("nan")
    out = compiled(*args)
    _ = float(np.asarray(jax.tree_util.tree_leaves(out)[-1]).ravel()[0])
    t0 = time.perf_counter()
    for _ in range(iters):
        out = compiled(*args)
    _ = float(np.asarray(jax.tree_util.tree_leaves(out)[-1]).ravel()[0])
    dt = (time.perf_counter() - t0) / iters
    return {"remat": remat, "ms_per_iter": dt * 1e3,
            "samples_per_sec": batch / dt, "tflops_per_sec": flops / dt / 1e12,
            "flops_per_iter_g": flops / 1e9, "compile_s": compile_s}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--f32", action="store_true")
    args = ap.parse_args()

    import jax
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(_REPO, ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    bf16 = not args.f32
    for remat in (False, True):
        r = measure(args.batch, bf16, remat, args.iters)
        r.update(batch=args.batch, bf16=bf16)
        print(json.dumps(r), flush=True)


if __name__ == "__main__":
    main()
