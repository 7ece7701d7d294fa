"""End-to-end training smoke test on a synthetic dataset (the fake-backend
counterpart of the reference's dnn.py test_dnn logistic-regression smoke)."""

import json
import os

import numpy as np
import pytest

from spatialaudiogen_tpu.config import TrainConfig
from spatialaudiogen_tpu.data.synthetic import make_synthetic_dataset
from spatialaudiogen_tpu.train.trainer import Trainer


@pytest.fixture(scope="module")
def db(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("traindb"))
    make_synthetic_dataset(root, n_videos=2, duration=3.0, frame_hw=(64, 128), seed=1)
    return root


def _cfg(db, model_dir, **kw):
    base = dict(db_dir=db, model_dir=model_dir, encoders=("audio",),
                separation="none", n_iters=4, batch_size=4, n_workers=2,
                log_every=2, ckpt_every=0, n_data=1, seed=0)
    base.update(kw)
    return TrainConfig(**base)


def test_train_smoke_and_resume(db, tmp_path):
    model_dir = str(tmp_path / "model")
    cfg = _cfg(db, model_dir)
    trainer = Trainer(cfg)
    state, step = trainer.train()
    assert step == 4

    # config + metrics artifacts written
    assert os.path.exists(os.path.join(model_dir, "train-params.json"))
    assert os.path.exists(os.path.join(model_dir, "train-params.txt"))
    lines = open(os.path.join(model_dir, "metrics.jsonl")).read().splitlines()
    recs = [json.loads(l) for l in lines]
    assert any(r["step"] == 0 for r in recs)
    assert all(np.isfinite(r["total_loss"]) for r in recs if "total_loss" in r)

    # checkpoint exists and resume continues from step 4
    cfg2 = _cfg(db, model_dir, resume=True, n_iters=6)
    trainer2 = Trainer(cfg2)
    assert trainer2.init_step == 4
    state2, step2 = trainer2.train()
    assert step2 == 6


def test_config_roundtrip(tmp_path):
    cfg = TrainConfig(db_dir="x", model_dir=str(tmp_path), encoders=("audio", "video"),
                      loc_units=(256, 256), subset_fn=None)
    cfg.save()
    loaded = TrainConfig.load(str(tmp_path))
    assert loaded.encoders == ("audio", "video")
    assert loaded.loc_units == (256, 256)
    # the reference-format txt parses too
    os.remove(os.path.join(str(tmp_path), "train-params.json"))
    loaded_txt = TrainConfig.load(str(tmp_path))
    assert loaded_txt.encoders == ("audio", "video")
    assert loaded_txt.loc_units == (256, 256)
    assert loaded_txt.lr == cfg.lr


def test_staircase_lr_boundary_changes_update_scale():
    """The staircase schedule must actually halve Adam's update magnitude at
    the decay boundary (guards the 1M-iter run; myutils.py:214-222)."""
    import jax.numpy as jnp
    import optax

    from spatialaudiogen_tpu.train.lr import make_optimizer, staircase_decay

    sched = staircase_decay(1e-4, 0.5, 250000)
    assert float(sched(0)) == pytest.approx(1e-4)
    assert float(sched(249999)) == pytest.approx(1e-4)
    assert float(sched(250000)) == pytest.approx(5e-5)
    assert float(sched(500000)) == pytest.approx(2.5e-5)

    tx = make_optimizer(1e-3, 0.5, decay_steps=10)
    params = {"w": jnp.zeros((4,))}
    grads = {"w": jnp.ones((4,))}
    state = tx.init(params)
    deltas = []
    for _ in range(20):
        updates, state = tx.update(grads, state, params)
        params = optax.apply_updates(params, updates)
        deltas.append(float(jnp.abs(updates["w"]).max()))
    # steady-state Adam with constant grads steps by ~lr; halves at step 10
    assert deltas[9] == pytest.approx(deltas[8], rel=0.05)
    assert deltas[10] == pytest.approx(0.5 * deltas[9], rel=0.05)
    assert deltas[19] == pytest.approx(0.5 * deltas[8], rel=0.05)


def test_visual_encoder_vid_dur_guard():
    """Non-integer sample_duration * video_rate with a visual encoder must
    fail loudly; integers >= 1 are supported (the reference only allows ==1,
    model.py:216-232 would silently mis-batch more)."""
    from spatialaudiogen_tpu.models import SptAudioGenConfig

    with pytest.raises(AssertionError, match="integer"):
        SptAudioGenConfig(encoders=("audio", "video"), sample_duration=0.15)
    # audio-only configs stay free to change the window
    cfg = SptAudioGenConfig(encoders=("audio",), sample_duration=0.2)
    assert cfg.geometry.snd_dur == 9600


def test_multi_frame_window_forward():
    """vid_dur=2 (sample_duration=0.2): per-frame video embeddings align to
    their audio steps instead of mis-batching. Batch-equivariance catches
    any cross-window feature mixing in the fold/unfold reshapes."""
    import numpy as np

    import jax

    from spatialaudiogen_tpu.models import SptAudioGen, SptAudioGenConfig

    cfg = SptAudioGenConfig(encoders=("audio", "video"), separation="unet_mask",
                            sample_duration=0.2, sep_num_tracks=2)
    g = cfg.geometry
    assert g.vid_dur == 2
    model = SptAudioGen(cfg)
    rng = np.random.RandomState(0)
    audio = rng.randn(2, g.snd_size, 1).astype(np.float32) * 0.1
    video = rng.rand(2, g.vid_dur, 64, 128, 3).astype(np.float32) - 0.5
    vs = model.init(jax.random.PRNGKey(0), audio, video, train=False)
    out = np.asarray(model.apply(vs, audio, video, train=False))
    assert out.shape == (2, g.snd_dur, 3)
    assert np.isfinite(out).all()
    out_p = np.asarray(model.apply(vs, audio[::-1].copy(), video[::-1].copy(),
                                   train=False))
    np.testing.assert_allclose(out[::-1], out_p, atol=1e-5)


def test_bf16_fast_mode_trains(db, tmp_path):
    """compute_dtype=bfloat16 (the --bf16 fast mode): params stay f32,
    loss stays finite, and a checkpoint round-trips."""
    import jax
    import jax.numpy as jnp

    model_dir = str(tmp_path / "bf16model")
    root = db
    cfg = TrainConfig(db_dir=root, model_dir=model_dir, encoders=("audio",),
                      separation="unet_mask", num_sep_tracks=2, n_iters=2,
                      batch_size=2, n_workers=1, log_every=1, ckpt_every=0,
                      n_data=1, compute_dtype="bfloat16")
    trainer = Trainer(cfg)
    trainer.train()
    leaves = jax.tree_util.tree_leaves(trainer.state.params)
    assert all(l.dtype == jnp.float32 for l in leaves)  # f32 master weights
    loaded = TrainConfig.load(model_dir)
    assert loaded.compute_dtype == "bfloat16"


def test_sigterm_checkpoints_and_exits_cleanly(db, tmp_path):
    """Preemption safety: SIGTERM mid-training stops at the next step
    boundary and still writes a checkpoint (TPU workers get SIGTERM'ed;
    the reference only caught python exceptions, train.py:227)."""
    import signal
    import subprocess
    import sys
    import time as _time

    model_dir = str(tmp_path / "sigterm_model")
    code = f"""
import jax
jax.config.update("jax_platforms", "cpu")
from spatialaudiogen_tpu.config import TrainConfig
from spatialaudiogen_tpu.train.trainer import Trainer
cfg = TrainConfig(db_dir={db!r}, model_dir={model_dir!r}, encoders=("audio",),
                  separation="none", n_iters=100000, batch_size=2, n_workers=1,
                  log_every=1, ckpt_every=0, n_data=1)
print("TRAINER_READY", flush=True)
Trainer(cfg).train()
print("TRAINER_EXITED_CLEANLY", flush=True)
"""
    proc = subprocess.Popen([sys.executable, "-c", code],
                            stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
                            text=True)
    try:
        # wait until some steps have run (first TRAIN log line), then SIGTERM
        deadline = _time.time() + 300
        lines = []
        for line in proc.stdout:
            lines.append(line)
            if "total_loss" in line:
                break
            assert _time.time() < deadline, "".join(lines)
        proc.send_signal(signal.SIGTERM)
        out, _ = proc.communicate(timeout=120)
        lines.append(out)
    finally:
        if proc.poll() is None:
            proc.kill()
    full = "".join(lines)
    assert proc.returncode == 0, full
    assert "TRAINER_EXITED_CLEANLY" in full, full
    import os as _os

    assert _os.path.exists(_os.path.join(model_dir, "checkpoints")), full


def test_pretrained_resnet_init(db, tmp_path):
    """--pretrained_resnet applies a reference-style resnet18.npy to the
    visual encoder at train start (restore_pretrained parity, model.py:198):
    video_encoder params take the npy values, the rest keep fresh init."""
    import numpy as np

    from spatialaudiogen_tpu.models.convert import to_tf_var_dict

    model_dir = str(tmp_path / "pre_model")
    cfg = _cfg(db, model_dir, encoders=("audio", "video"), n_iters=0,
               batch_size=2, frame_hw=(64, 128))
    trainer = Trainer(cfg)  # fresh init, no pretrained
    variables = {"params": trainer.state.params["video_encoder"],
                 "batch_stats": trainer.state.batch_stats["video_encoder"]}
    tf_vars = to_tf_var_dict(variables)
    rng = np.random.RandomState(0)
    blob = {k: np.asarray(v) + rng.randn(*np.shape(v)).astype(np.float32)
            for k, v in tf_vars.items()}
    npy_path = str(tmp_path / "resnet18.npy")
    np.save(npy_path, blob, allow_pickle=True)

    cfg2 = _cfg(db, str(tmp_path / "pre_model2"), encoders=("audio", "video"),
                n_iters=0, batch_size=2, frame_hw=(64, 128),
                pretrained_resnet=npy_path)
    trainer2 = Trainer(cfg2)
    got = trainer2.state.params["video_encoder"]["conv1"]["conv"]["kernel"]
    want = blob["conv1/weights"]
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-6)
    # non-visual params keep their fresh init (same seed => same values)
    np.testing.assert_allclose(
        np.asarray(trainer2.state.params["audio_encoder"]["conv1"]["conv"]["kernel"]),
        np.asarray(trainer.state.params["audio_encoder"]["conv1"]["conv"]["kernel"]),
        atol=0)


def test_pretrained_resnet_applies_to_flow_encoder(tmp_path):
    """With video+flow encoders the same npy blob (loaded once) initializes
    both visual towers (reference instantiates the same pretrained ResNet18
    twice, model.py:383-396)."""
    import numpy as np

    from spatialaudiogen_tpu.data.synthetic import make_synthetic_dataset
    from spatialaudiogen_tpu.models.convert import to_tf_var_dict

    root = str(tmp_path / "flowdb")
    make_synthetic_dataset(root, n_videos=2, duration=3.0, frame_hw=(64, 128),
                           with_flow=True, seed=4)
    cfg = _cfg(root, str(tmp_path / "m0"), encoders=("audio", "video", "flow"),
               n_iters=0, batch_size=2, frame_hw=(64, 128))
    trainer = Trainer(cfg)
    variables = {"params": trainer.state.params["video_encoder"],
                 "batch_stats": trainer.state.batch_stats["video_encoder"]}
    rng = np.random.RandomState(5)
    blob = {k: np.asarray(v) + rng.randn(*np.shape(v)).astype(np.float32)
            for k, v in to_tf_var_dict(variables).items()}
    npy_path = str(tmp_path / "resnet18.npy")
    np.save(npy_path, blob, allow_pickle=True)

    cfg2 = _cfg(root, str(tmp_path / "m1"), encoders=("audio", "video", "flow"),
                n_iters=0, batch_size=2, frame_hw=(64, 128),
                pretrained_resnet=npy_path)
    trainer2 = Trainer(cfg2)
    for enc in ("video_encoder", "flow_encoder"):
        got = trainer2.state.params[enc]["conv2_1"]["conv_1"]["conv"]["kernel"]
        want = blob["conv2_1/conv_1/weights"]
        np.testing.assert_allclose(np.asarray(got), want, atol=1e-6, err_msg=enc)


def test_pretrained_applies_when_resume_finds_no_checkpoint(db, tmp_path):
    """--resume with no checkpoint on disk (killed before the first save)
    must still apply --pretrained_resnet instead of silently training from
    random weights (the gate keys on checkpoint presence, not the flag)."""
    import numpy as np

    from spatialaudiogen_tpu.models.convert import to_tf_var_dict

    cfg0 = _cfg(db, str(tmp_path / "seedm"), encoders=("audio", "video"),
                n_iters=0, batch_size=2, frame_hw=(64, 128))
    trainer0 = Trainer(cfg0)
    variables = {"params": trainer0.state.params["video_encoder"],
                 "batch_stats": trainer0.state.batch_stats["video_encoder"]}
    rng = np.random.RandomState(7)
    blob = {k: np.asarray(v) + rng.randn(*np.shape(v)).astype(np.float32)
            for k, v in to_tf_var_dict(variables).items()}
    npy_path = str(tmp_path / "resnet18.npy")
    np.save(npy_path, blob, allow_pickle=True)

    model_dir = str(tmp_path / "resume_nockpt")
    # simulate a run killed after the config save but before any checkpoint
    _cfg(db, model_dir, encoders=("audio", "video"), n_iters=0,
         batch_size=2, frame_hw=(64, 128)).save(model_dir)
    cfg = _cfg(db, model_dir, encoders=("audio", "video"), n_iters=0,
               batch_size=2, frame_hw=(64, 128), resume=True,
               pretrained_resnet=npy_path)
    trainer = Trainer(cfg)  # model_dir has params but no checkpoints
    got = trainer.state.params["video_encoder"]["conv1"]["conv"]["kernel"]
    np.testing.assert_allclose(np.asarray(got), blob["conv1/weights"],
                               atol=1e-6)


def test_u8_frame_transport_matches_f32(db, tmp_path):
    """The u8 frame transport (feeder ships raw uint8, train/steps.py
    normalizes on device) matches host-prepped f32 frames to float
    rounding: XLA strength-reduces the /255 to a reciprocal multiply, so
    the prepped pixels differ by <=1 ulp and the loss by ~1e-6 relative.
    Params after one Adam step match within 2*lr absolute: Adam normalizes
    each gradient coordinate to a +-lr step, so a near-zero gradient may
    sign-flip its update under any 1-ulp input change — the bound is
    structural, not sloppy."""
    import jax

    from spatialaudiogen_tpu.data.readers import (SampleReader,
                                                  img_prep_default,
                                                  img_prep_u8)
    from spatialaudiogen_tpu.models import SptAudioGen
    from spatialaudiogen_tpu.train.lr import make_optimizer
    from spatialaudiogen_tpu.train.state import create_train_state
    from spatialaudiogen_tpu.train.steps import make_train_step

    cfg = _cfg(db, str(tmp_path / "m"), encoders=("audio", "video"),
               batch_size=2, frame_hw=(64, 128))
    folder = os.path.join(db, sorted(os.listdir(db))[0])

    def batch_with(prep):
        r = SampleReader(folder, img_prep=prep, shuffle=False,
                         random_rotations=False, return_video=True,
                         rng=np.random.RandomState(0))
        chunks = [r.get(), r.get()]
        return {k: np.stack([c[k] for c in chunks]) for k in
                ("ambix", "video")} | {
                "audio_mask": np.ones((2, 4), np.float32)}

    b_u8, b_f32 = batch_with(img_prep_u8), batch_with(img_prep_default)
    assert b_u8["video"].dtype == np.uint8
    assert b_f32["video"].dtype == np.float32

    model = SptAudioGen(cfg.model_config())
    tx = make_optimizer()
    state = create_train_state(model, tx, jax.random.PRNGKey(0), b_f32)
    step = jax.jit(make_train_step(model, tx))
    s1, m1 = step(state, b_u8)
    s2, m2 = step(state, b_f32)
    np.testing.assert_allclose(float(m1["total_loss"]),
                               float(m2["total_loss"]), rtol=2e-6)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=3e-4, atol=2.1e-4),
        s1.params, s2.params)
