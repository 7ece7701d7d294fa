"""Headline benchmark: deploy realtime factor (audio-sec/sec/chip).

Runs the flagship audio+RGB unet_mask model's mono->FOA forward (the
reference deploy.py workload, deploy.py:41-152) in a batched sliding-window
configuration on one chip and reports how many seconds of spatial audio are
generated per wall-clock second.

Measurement notes: on the axon tunnel backend jax.block_until_ready does not
reliably block, so the result is reduced to a scalar on device and fetched
per run-end (in-order execution queue => the fetch waits for all queued
steps). Compiled executables persist in .jax_cache so reruns skip the long
tunnel compile.

BASELINE.json target: >= 50x realtime per v5e chip (vs_baseline = value/50).

Prints exactly one JSON line.
"""

import json
import time

import numpy as np

BASELINE_REALTIME = 50.0
BATCH = 128   # sliding windows per step; each emits 0.1 s of FOA
N_ITERS = 60


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from spatialaudiogen_tpu.models import SptAudioGen, SptAudioGenConfig

    cfg = SptAudioGenConfig(encoders=("audio", "video"), separation="unet_mask")
    g = cfg.geometry
    model = SptAudioGen(cfg)

    rng = np.random.RandomState(0)
    audio = rng.randn(BATCH, g.snd_size, g.num_in_channels).astype(np.float32) * 0.1
    video = (rng.rand(BATCH, g.vid_dur, 224, 448, 3).astype(np.float32) - 0.5)

    variables = jax.jit(
        lambda a, v: model.init(jax.random.PRNGKey(0), a, v, train=False)
    )(audio[:1], video[:1])
    fwd = jax.jit(
        lambda vars_, a, v: jnp.sum(model.apply(vars_, a, v, train=False) ** 2))

    d_audio, d_video = jax.device_put(audio), jax.device_put(video)
    checksum = float(fwd(variables, d_audio, d_video))  # compile + sync
    assert np.isfinite(checksum)

    t0 = time.perf_counter()
    for _ in range(N_ITERS):
        out = fwd(variables, d_audio, d_video)
    checksum = float(out)  # forces completion of the whole in-order queue
    dt = (time.perf_counter() - t0) / N_ITERS
    assert np.isfinite(checksum)

    realtime = BATCH * g.snd_dur / g.audio_rate / dt
    print(json.dumps({
        "metric": "deploy_realtime_factor",
        "value": round(realtime, 2),
        "unit": "audio_sec_per_sec_per_chip",
        "vs_baseline": round(realtime / BASELINE_REALTIME, 3),
    }))


if __name__ == "__main__":
    main()
