"""Sharded orbax checkpointing on the 8-device CPU mesh.

The reference's only durability primitive is a single-process
tf.train.Saver (reference train.py:155,223-225). Ours must be its
multi-chip-correct superset: arrays are saved as sharded (no device_get
gather), saves are async, and restore reshards onto a different mesh
shape than the save. These tests pin exactly that: train 2 steps on a
(4,2) DP+TP mesh -> save -> restore onto (2,1), (1,1) and the original
(4,2) with bitwise-equal gathered params, and training resumes from the
restored state.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from spatialaudiogen_tpu.models import SptAudioGen, SptAudioGenConfig
from spatialaudiogen_tpu.parallel.mesh import MODEL_AXIS, batch_sharding, make_mesh
from spatialaudiogen_tpu.train import create_train_state, make_train_step
from spatialaudiogen_tpu.train.checkpoint import (
    Checkpointer,
    latest_step,
    restore_checkpoint,
)
from spatialaudiogen_tpu.train.lr import make_optimizer
from spatialaudiogen_tpu.train.steps import jit_sharded


def _cfg():
    return SptAudioGenConfig(encoders=("audio",), separation="none")


def _batch(cfg, batch=8):
    g = cfg.geometry
    rng = np.random.RandomState(0)
    return {
        "ambix": rng.randn(batch, g.snd_size, g.num_ambi_channels).astype(np.float32) * 0.1,
        "audio_mask": np.ones((batch, g.num_ambi_channels), np.float32),
    }


def _trained_state(cfg, mesh, batch, n_steps=2):
    model = SptAudioGen(cfg)
    tx = make_optimizer(1e-4)
    state = create_train_state(model, tx, jax.random.PRNGKey(0), batch)
    jitted, shardings = jit_sharded(make_train_step(model, tx), state, tx, mesh,
                                    donate_state=False)
    state = jax.device_put(state, shardings)
    dbatch = jax.device_put(batch, batch_sharding(mesh))
    for _ in range(n_steps):
        state, _ = jitted(state, dbatch)
    return model, tx, jitted, state, dbatch


def _gathered(tree):
    return jax.tree_util.tree_map(lambda x: np.asarray(jax.device_get(x)), tree)


@pytest.fixture(scope="module")
def saved(tmp_path_factory):
    """Train 2 steps on (4,2), save sharded; return the dir + gathered truth."""
    model_dir = str(tmp_path_factory.mktemp("ckpt_sharded"))
    cfg = _cfg()
    batch = _batch(cfg)
    mesh = make_mesh(n_data=4, n_model=2)
    model, tx, jitted, state, dbatch = _trained_state(cfg, mesh, batch)
    # the TP-wide bottleneck kernel really is sharded over 'model' at save time
    tp_kernel = state.params["bottleneck"]["audio-fc"]["dense"]["kernel"]
    assert tp_kernel.sharding.spec == jax.sharding.PartitionSpec(None, MODEL_AXIS)
    assert not tp_kernel.is_fully_replicated
    with Checkpointer(model_dir) as ckpt:
        ckpt.save(2, state, wait=True)
    return {
        "model_dir": model_dir,
        "cfg": cfg,
        "batch": batch,
        "params": _gathered(state.params),
        "opt_state": _gathered(state.opt_state),
        "step": int(state.step),
    }


@pytest.mark.parametrize("shape", [(2, 1), (1, 1), (4, 2)])
def test_restore_onto_other_mesh_is_bitwise_equal(saved, shape):
    n_data, n_model = shape
    cfg, batch = saved["cfg"], saved["batch"]
    mesh = make_mesh(n_data=n_data, n_model=n_model,
                     devices=jax.devices()[: n_data * n_model])
    model = SptAudioGen(cfg)
    tx = make_optimizer(1e-4)
    target = create_train_state(model, tx, jax.random.PRNGKey(1), batch)
    _, shardings = jit_sharded(make_train_step(model, tx), target, tx, mesh,
                               donate_state=False)
    target = jax.device_put(target, shardings)
    restored, step = restore_checkpoint(saved["model_dir"], target)
    assert step == 2
    assert int(restored.step) == saved["step"]
    # restored arrays live on the TARGET mesh with the target's shardings
    leaf = restored.params["localization"]["fc1"]["dense"]["kernel"]
    assert leaf.sharding.mesh.shape["data"] == n_data
    got = _gathered(restored.params)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_array_equal(a, b), got, saved["params"])
    got_opt = _gathered(restored.opt_state)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_array_equal(a, b),
        got_opt, saved["opt_state"])


def test_training_resumes_from_restored_state(saved):
    """Restore onto (2,1) and take a step: loss finite, step counter advances."""
    cfg, batch = saved["cfg"], saved["batch"]
    mesh = make_mesh(n_data=2, n_model=1, devices=jax.devices()[:2])
    model = SptAudioGen(cfg)
    tx = make_optimizer(1e-4)
    target = create_train_state(model, tx, jax.random.PRNGKey(1), batch)
    jitted, shardings = jit_sharded(make_train_step(model, tx), target, tx, mesh,
                                    donate_state=False)
    target = jax.device_put(target, shardings)
    restored, _ = restore_checkpoint(saved["model_dir"], target)
    dbatch = jax.device_put(batch, batch_sharding(mesh))
    new_state, metrics = jitted(restored, dbatch)
    assert np.isfinite(float(metrics["total_loss"]))
    assert int(new_state.step) == saved["step"] + 1


def test_async_save_overlaps_and_same_step_is_idempotent(tmp_path):
    """save() without wait returns before wait(); saving the same step twice
    (trainer exit path right after a periodic save) is a no-op."""
    cfg = _cfg()
    batch = _batch(cfg, batch=2)
    mesh = make_mesh(n_data=1, n_model=1, devices=jax.devices()[:1])
    model = SptAudioGen(cfg)
    tx = make_optimizer(1e-4)
    state = create_train_state(model, tx, jax.random.PRNGKey(0), batch)
    with Checkpointer(str(tmp_path)) as ckpt:
        ckpt.save(1, state)          # async
        ckpt.save(1, state)          # idempotent, must not raise
        ckpt.wait()
        assert ckpt.latest_step() == 1
    assert latest_step(str(tmp_path)) == 1
    # a fresh Checkpointer (a NEW run into the same model_dir) must
    # OVERWRITE an existing step with the new state, not silently keep the
    # stale weights (tf.train.Saver semantics) — regression: the dedupe
    # guard used to treat the directory's pre-existing latest step as
    # "already saved" and skipped the write
    state_b = create_train_state(model, tx, jax.random.PRNGKey(7), batch)
    with Checkpointer(str(tmp_path)) as ckpt:
        ckpt.save(1, state_b, wait=True)
        assert ckpt.latest_step() == 1
    restored, step = restore_checkpoint(str(tmp_path), state)
    assert step == 1
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a), np.asarray(b)),
        restored.params, state_b.params)
