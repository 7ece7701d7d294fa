"""Sharded training-step tests on the 8-device virtual CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np

from spatialaudiogen_tpu.models import SptAudioGen, SptAudioGenConfig
from spatialaudiogen_tpu.parallel.mesh import (
    MODEL_AXIS,
    batch_sharding,
    make_mesh,
    param_sharding_specs,
)
from spatialaudiogen_tpu.train import create_train_state, make_train_step
from spatialaudiogen_tpu.train.lr import make_optimizer
from spatialaudiogen_tpu.train.steps import jit_sharded, make_eval_step
from spatialaudiogen_tpu.train.state import init_variables


def _synthetic_batch(cfg, batch):
    g = cfg.geometry
    rng = np.random.RandomState(0)
    out = {
        "ambix": rng.randn(batch, g.snd_size, g.num_ambi_channels).astype(np.float32) * 0.1,
        "audio_mask": np.ones((batch, g.num_ambi_channels), np.float32),
    }
    if "video" in cfg.encoders:
        out["video"] = rng.rand(batch, g.vid_dur, 64, 128, 3).astype(np.float32) - 0.5
    return out


def test_dp_tp_train_step_runs_and_updates():
    assert len(jax.devices()) == 8
    cfg = SptAudioGenConfig(encoders=("audio", "video"), separation="unet_mask",
                            sep_num_tracks=8)
    mesh = make_mesh(n_data=4, n_model=2)
    model = SptAudioGen(cfg)
    tx = make_optimizer(1e-4)
    batch = _synthetic_batch(cfg, batch=8)

    state = create_train_state(model, tx, jax.random.PRNGKey(0), batch)
    # TP rule applies to wide dense kernels
    specs = param_sharding_specs(state.params, mesh)
    fused_kernel_spec = specs["bottleneck"]["audio-fc"]["dense"]["kernel"]
    assert fused_kernel_spec == jax.sharding.PartitionSpec(None, MODEL_AXIS)

    step_fn = make_train_step(model, tx)
    jitted, shardings = jit_sharded(step_fn, state, tx, mesh)
    state = jax.device_put(state, shardings)
    dbatch = jax.device_put(batch, batch_sharding(mesh))

    old_kernel = np.asarray(
        jax.device_get(state.params["localization"]["fc1"]["dense"]["kernel"]))
    state2, metrics = jitted(state, dbatch)
    total = float(metrics["total_loss"])
    assert np.isfinite(total)
    assert int(state2.step) == 1
    new_kernel = np.asarray(
        jax.device_get(state2.params["localization"]["fc1"]["dense"]["kernel"]))
    assert not np.allclose(old_kernel, new_kernel)
    # TP param is actually sharded over the model axis
    sh = state2.params["bottleneck"]["audio-fc"]["dense"]["kernel"].sharding
    assert sh.spec == jax.sharding.PartitionSpec(None, MODEL_AXIS)


def test_loss_decreases_on_fixed_batch():
    """A static-source target (fixed gains of the mono) is learnable by the
    localization head; loss must descend monotonically at the default lr."""
    cfg = SptAudioGenConfig(encoders=("audio",), separation="none")
    g = cfg.geometry
    mesh = make_mesh(n_data=8, n_model=1)
    model = SptAudioGen(cfg)
    tx = make_optimizer(1e-4)
    rng = np.random.RandomState(0)
    mono = rng.randn(8, g.snd_size, 1).astype(np.float32) * 0.1
    gains = np.array([0.5, -0.3, 0.8], np.float32)
    batch = {"ambix": np.concatenate([mono, mono * gains], 2),
             "audio_mask": np.ones((8, 4), np.float32)}
    state = create_train_state(model, tx, jax.random.PRNGKey(0), batch)
    step_fn = make_train_step(model, tx)
    jitted, shardings = jit_sharded(step_fn, state, tx, mesh)
    state = jax.device_put(state, shardings)
    dbatch = jax.device_put(batch, batch_sharding(mesh))
    losses = []
    for _ in range(10):
        state, metrics = jitted(state, dbatch)
        losses.append(float(metrics["stft/mse"]))
    assert losses[-1] < 0.5 * losses[0], losses


def test_eval_step_matches_training_metric_names():
    cfg = SptAudioGenConfig(encoders=("audio",), separation="none")
    model = SptAudioGen(cfg)
    tx = make_optimizer()
    batch = _synthetic_batch(cfg, batch=2)
    state = create_train_state(model, tx, jax.random.PRNGKey(0), batch)
    eval_step = jax.jit(make_eval_step(model))
    pred, mono, target, metrics, per_sample = eval_step(state, batch)
    g = cfg.geometry
    assert pred.shape == (2, g.snd_dur, 3)
    assert mono.shape == (2, g.snd_dur, 1)
    assert set(per_sample) == {"stft", "lsd", "mse", "snr"}
    for k in ("stft/avg", "lsd/avg", "mse/avg", "snr/avg", "pow/pred", "pow/gt"):
        assert np.isfinite(float(metrics[k]))


def test_single_device_mesh_also_works():
    cfg = SptAudioGenConfig(encoders=("audio",), separation="none")
    mesh = make_mesh(n_data=1, n_model=1, devices=jax.devices()[:1])
    model = SptAudioGen(cfg)
    tx = make_optimizer()
    batch = _synthetic_batch(cfg, batch=2)
    state = create_train_state(model, tx, jax.random.PRNGKey(0), batch)
    jitted, shardings = jit_sharded(make_train_step(model, tx), state, tx, mesh)
    state = jax.device_put(state, shardings)
    dbatch = jax.device_put(batch, batch_sharding(mesh))
    state, metrics = jitted(state, dbatch)
    assert np.isfinite(float(metrics["total_loss"]))
