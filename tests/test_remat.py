"""Rematerialization must not change values or gradients."""

import jax
import jax.numpy as jnp
import numpy as np

from spatialaudiogen_tpu.models import SptAudioGen, SptAudioGenConfig


def test_remat_matches_plain():
    kw = dict(encoders=("audio", "video"), separation="unet_mask", sep_num_tracks=4)
    cfg_plain = SptAudioGenConfig(remat=False, **kw)
    cfg_remat = SptAudioGenConfig(remat=True, **kw)
    g = cfg_plain.geometry
    rng = np.random.RandomState(0)
    audio = jnp.asarray(rng.randn(1, g.snd_size, 1) * 0.1, jnp.float32)
    video = jnp.asarray(rng.rand(1, 1, 64, 128, 3) - 0.5, jnp.float32)
    target = jnp.asarray(rng.randn(1, g.snd_dur, 3) * 0.1, jnp.float32)

    plain = SptAudioGen(cfg_plain)
    remat = SptAudioGen(cfg_remat)
    variables = plain.init(jax.random.PRNGKey(0), audio, video, train=False)
    # same params work in both (remat does not change the tree)
    out_p = plain.apply(variables, audio, video, train=False)
    out_r = remat.apply(variables, audio, video, train=False)
    np.testing.assert_allclose(np.asarray(out_p), np.asarray(out_r), atol=1e-5)

    def loss(model):
        def fn(params):
            pred = model.apply({"params": params,
                                "batch_stats": variables["batch_stats"]},
                               audio, video, train=False)
            return jnp.mean((pred - target) ** 2)
        return fn

    g_p = jax.grad(loss(plain))(variables["params"])
    g_r = jax.grad(loss(remat))(variables["params"])
    flat_p = jax.tree_util.tree_leaves(g_p)
    flat_r = jax.tree_util.tree_leaves(g_r)
    for a, b in zip(flat_p, flat_r):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-5, rtol=1e-4)
