"""Device mel-LSD / envelope metrics (ops/eval_metrics.py) vs host numpy."""

import numpy as np

from spatialaudiogen_tpu.eval.host_metrics import (
    compute_envelope_dist,
    compute_mel_lsd,
)


def _pairs(b=4, t=4800, c=3, seed=0):
    rng = np.random.RandomState(seed)
    pred = rng.randn(b, t, c).astype(np.float32) * 0.1
    gt = pred + rng.randn(b, t, c).astype(np.float32) * 0.05
    gt[1] = pred[1]  # identical channel set
    return pred, gt


def test_mel_lsd_matches_host():
    import jax

    from spatialaudiogen_tpu.ops.eval_metrics import mel_lsd_batch_fn

    pred, gt = _pairs()
    dev = np.asarray(jax.jit(mel_lsd_batch_fn(48000))(pred, gt))
    host = np.stack([compute_mel_lsd(pred[i], gt[i], 48000)
                     for i in range(pred.shape[0])])
    np.testing.assert_allclose(dev, host, atol=1e-5)
    assert np.all(dev[1] < 1e-6)  # identical pair -> 0


def test_envelope_matches_host():
    import jax

    from spatialaudiogen_tpu.ops.eval_metrics import envelope_dist_fn

    pred, gt = _pairs()
    dev = np.asarray(jax.jit(envelope_dist_fn(4800))(pred, gt))
    host = np.stack([compute_envelope_dist(pred[i], gt[i])
                     for i in range(pred.shape[0])])
    np.testing.assert_allclose(dev, host, atol=1e-6)


def test_hilbert_kernel_matches_scipy():
    from scipy.signal import hilbert

    from spatialaudiogen_tpu.ops.eval_metrics import _hilbert_kernel

    for t in (256, 255):  # even + odd lengths
        rng = np.random.RandomState(t)
        x = rng.randn(t)
        hx = _hilbert_kernel(t).astype(np.float64) @ x
        np.testing.assert_allclose(hx, hilbert(x).imag, atol=1e-5)


def test_evaluator_device_metrics_matches_host(tmp_path):
    from spatialaudiogen_tpu.config import TrainConfig
    from spatialaudiogen_tpu.data.synthetic import make_synthetic_dataset
    from spatialaudiogen_tpu.eval.evaluator import Evaluator
    from spatialaudiogen_tpu.train.trainer import Trainer

    root = str(tmp_path / "db")
    make_synthetic_dataset(root, n_videos=2, duration=3.0, frame_hw=(64, 128),
                           seed=3)
    model_dir = str(tmp_path / "model")
    cfg = TrainConfig(db_dir=root, model_dir=model_dir, encoders=("audio",),
                      separation="none", n_iters=2, batch_size=4, n_workers=2,
                      log_every=10, ckpt_every=0, n_data=1, seed=0)
    Trainer(cfg).train()

    host = Evaluator(model_dir, batch_size=3, db_dir=root, emd_ang_res=36)
    s_host, r_host = host.run(output_fn=str(tmp_path / "host.txt"))
    dev = Evaluator(model_dir, batch_size=3, db_dir=root, emd_ang_res=36,
                    device_metrics=True, emd_mode="sinkhorn")
    s_dev, r_dev = dev.run(output_fn=str(tmp_path / "dev.txt"))

    assert len(r_host) == len(r_dev)
    for key in s_host:
        tol = dict(rtol=5e-3, atol=5e-4) if key.startswith("emd/") \
            else dict(rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(s_dev[key], s_host[key], err_msg=key, **tol)


def test_evaluator_device_metrics_sharded_matches_single(tmp_path):
    """The device metric fns (sinkhorn EMD + spectral) consume the eval
    step's GSPMD-sharded outputs on a data-parallel mesh and match the
    single-device values (the jitted metric calls see sharded pred/target
    and XLA inserts the gathers)."""
    import os

    from spatialaudiogen_tpu.config import TrainConfig
    from spatialaudiogen_tpu.data.synthetic import make_synthetic_dataset
    from spatialaudiogen_tpu.eval.evaluator import Evaluator
    from spatialaudiogen_tpu.parallel.mesh import make_mesh
    from spatialaudiogen_tpu.train.trainer import Trainer

    root = str(tmp_path / "db")
    make_synthetic_dataset(root, n_videos=2, duration=3.0, frame_hw=(64, 128),
                           seed=3)
    model_dir = str(tmp_path / "model")
    cfg = TrainConfig(db_dir=root, model_dir=model_dir, encoders=("audio",),
                      separation="none", n_iters=2, batch_size=4, n_workers=2,
                      log_every=10, ckpt_every=0, n_data=1, seed=0)
    Trainer(cfg).train()

    kw = dict(batch_size=4, db_dir=root, emd_ang_res=36,
              device_metrics=True, emd_mode="sinkhorn")
    single = Evaluator(model_dir, **kw)
    s_sum, s_res = single.run(host_threads=2, print_every=0)
    sharded = Evaluator(model_dir, mesh=make_mesh(n_data=4, n_model=1), **kw)
    m_sum, m_res = sharded.run(
        host_threads=2, print_every=0,
        output_fn=os.path.join(model_dir, "eval-sharded.txt"))
    assert len(s_res) == len(m_res)
    for key in ("stft/avg", "mel_lsd/avg", "env_mse/avg", "emd/dir",
                "emd/dir2", "amplitude/predicted"):
        np.testing.assert_allclose(m_sum[key], s_sum[key], rtol=1e-3,
                                   atol=1e-5, err_msg=key)
