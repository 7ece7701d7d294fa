"""Higher ambisonic orders and bf16 compute-dtype coverage."""

import jax
import jax.numpy as jnp
import numpy as np

from spatialaudiogen_tpu.models import SptAudioGen, SptAudioGenConfig


def test_second_order_model_shapes():
    """ambi_order=2: 4 input channels (W,Y,Z,X), 5 predicted channels."""
    cfg = SptAudioGenConfig(ambi_order=2, encoders=("audio",), separation="unet_mask",
                            sep_num_tracks=4)
    g = cfg.geometry
    assert g.num_in_channels == 4 and g.num_out_channels == 5
    rng = np.random.RandomState(0)
    audio = jnp.asarray(rng.randn(1, g.snd_size, 4), jnp.float32)
    model = SptAudioGen(cfg)
    variables = model.init(jax.random.PRNGKey(0), audio, train=False)
    out, ends = model.apply(variables, audio, train=False, return_ends=True)
    assert out.shape == (1, g.snd_dur, 5)
    assert ends["separation"].shape == (1, 4, 4, g.snd_dur)      # n_in x tracks
    assert ends["localization/weights"].shape == (1, g.snd_dur, 5, 4, 4)
    assert bool(jnp.isfinite(out).all())


def test_bf16_compute_dtype_trains():
    cfg = SptAudioGenConfig(encoders=("audio",), separation="unet_mask",
                            sep_num_tracks=4, dtype=jnp.bfloat16,
                            dft_precision="default")
    g = cfg.geometry
    rng = np.random.RandomState(1)
    audio = jnp.asarray(rng.randn(2, g.snd_size, 1) * 0.1, jnp.float32)
    target = jnp.asarray(rng.randn(2, g.snd_dur, 3) * 0.1, jnp.float32)
    model = SptAudioGen(cfg)
    variables = model.init(jax.random.PRNGKey(0), audio, train=False)
    # params stay f32 (mixed precision: bf16 activations, f32 master weights)
    kernel = variables["params"]["audio_encoder"]["conv1"]["conv"]["kernel"]
    assert kernel.dtype == jnp.float32

    def loss(params):
        pred = model.apply({"params": params}, audio, train=True)
        return jnp.mean((pred - target) ** 2)

    val, grads = jax.value_and_grad(loss)(variables["params"])
    assert np.isfinite(float(val))
    leaves = jax.tree_util.tree_leaves(grads)
    assert all(np.isfinite(np.asarray(g)).all() for g in leaves)
    assert any(float(jnp.abs(g).max()) > 0 for g in leaves)
