"""Headline benchmark: deploy realtime factor (audio-sec/sec/chip).

Runs the flagship audio+RGB unet_mask model's mono->FOA forward (the
reference deploy.py workload, deploy.py:41-152) in a batched sliding-window
configuration on one chip and reports how many seconds of spatial audio are
generated per wall-clock second.

BASELINE.json target: >= 50x realtime per v5e chip (vs_baseline = value/50).

Prints exactly one JSON line.
"""

import json
import time

import numpy as np

BASELINE_REALTIME = 50.0


def main():
    import jax

    # First compile of the batch-32 graph takes minutes on this backend;
    # persist compiled executables so reruns start in seconds.
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from spatialaudiogen_tpu.models import SptAudioGen, SptAudioGenConfig

    cfg = SptAudioGenConfig(encoders=("audio", "video"), separation="unet_mask")
    g = cfg.geometry
    model = SptAudioGen(cfg)

    batch = 32  # windows per step; each window emits 0.1 s of FOA
    rng = np.random.RandomState(0)
    audio = rng.randn(batch, g.snd_size, g.num_in_channels).astype(np.float32) * 0.1
    video = (rng.rand(batch, g.vid_dur, 224, 448, 3).astype(np.float32) - 0.5)

    variables = jax.jit(
        lambda a, v: model.init(jax.random.PRNGKey(0), a, v, train=False)
    )(audio[:1], video[:1])
    fwd = jax.jit(lambda vars_, a, v: model.apply(vars_, a, v, train=False))

    d_audio, d_video = jax.device_put(audio), jax.device_put(video)
    out = jax.block_until_ready(fwd(variables, d_audio, d_video))  # compile
    assert bool(jax.numpy.isfinite(out).all())

    # steady state
    n_iters = 30
    t0 = time.perf_counter()
    for _ in range(n_iters):
        out = fwd(variables, d_audio, d_video)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / n_iters

    audio_sec_per_step = batch * g.snd_dur / g.audio_rate
    realtime = audio_sec_per_step / dt
    print(json.dumps({
        "metric": "deploy_realtime_factor",
        "value": round(realtime, 2),
        "unit": "audio_sec_per_sec_per_chip",
        "vs_baseline": round(realtime / BASELINE_REALTIME, 3),
    }))


if __name__ == "__main__":
    main()
