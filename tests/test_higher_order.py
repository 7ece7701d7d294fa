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


def test_order2_end_to_end(tmp_path):
    """Order 2 actually WORKS end to end, not just in shapes: a 9-channel
    synthetic dataset trains (loss descends), the evaluator scores the full
    battery, and deploy emits mono(4)+predicted(5) = 9-channel output. The
    reference caps at order 1 (model.py:25-33 plumbs the order but nothing
    above 1 was ever run); higher order is this framework's own
    generalization, so it must be exercised for real."""
    import json
    import os

    from spatialaudiogen_tpu.config import TrainConfig
    from spatialaudiogen_tpu.data.synthetic import make_synthetic_dataset
    from spatialaudiogen_tpu.deploy.deploy import MonoToAmbix
    from spatialaudiogen_tpu.eval.evaluator import Evaluator
    from spatialaudiogen_tpu.train.trainer import Trainer

    root = str(tmp_path / "db")
    ids = make_synthetic_dataset(root, n_videos=1, duration=3.0,
                                 frame_hw=(64, 128), seed=21, ambi_order=2)
    model_dir = str(tmp_path / "model")
    cfg = TrainConfig(db_dir=root, model_dir=model_dir, encoders=("audio",),
                      separation="unet_mask", num_sep_tracks=4, ambi_order=2,
                      n_iters=20, batch_size=2, n_workers=2,
                      frame_hw=(64, 128), log_every=1, ckpt_every=0,
                      n_data=1, seed=0)
    Trainer(cfg).train()
    losses = [json.loads(line)["total_loss"]
              for line in open(os.path.join(model_dir, "metrics.jsonl"))
              if "total_loss" in line]
    assert len(losses) >= 16 and np.isfinite(losses).all(), losses
    assert np.mean(losses[-3:]) < np.mean(losses[:3]), losses

    summary, results = Evaluator(model_dir, batch_size=2, n_workers=2).run(
        host_threads=2, max_batches=1, print_every=0)
    assert results and np.isfinite(summary["stft/avg"]), summary

    model = MonoToAmbix(model_dir, batch_size=2)
    out = model.deploy(os.path.join(root, ids[0]), 0.5, 1.0)
    assert out.shape == (48000, 9), out.shape  # 4 input ch + 5 predicted
    assert np.isfinite(out).all()


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
