"""On-device Sinkhorn EMD (ops/sinkhorn.py) vs the exact native solver.

The exact path (ambisonics/emd.py, min-cost flow) is the parity reference;
these tests pin how tightly the annealed-Sinkhorn fast path tracks it, and
that the Evaluator's emd_mode="sinkhorn" produces the same eval battery.
"""

import numpy as np
import pytest

from spatialaudiogen_tpu.ambisonics.emd import ambix_emd, emd_hat, mesh_ground_distance
from spatialaudiogen_tpu.ambisonics.maps import spherical_mesh


@pytest.fixture(scope="module")
def mesh30():
    phi, nu = spherical_mesh(30.0, inclusive_nu=True)
    return mesh_ground_distance(phi, nu).astype(np.float32)


def test_emd_hat_sinkhorn_matches_exact(mesh30):
    import jax
    import jax.numpy as jnp

    from spatialaudiogen_tpu.ops.sinkhorn import emd_hat_sinkhorn

    n = mesh30.shape[0]
    rng = np.random.RandomState(0)
    b = 8
    p = rng.rand(b, n).astype(np.float32) * 0.02
    q = rng.rand(b, n).astype(np.float32) * 0.02
    for i in range(4):  # concentrated maps: the realistic power-map shape
        p[i] *= 0.001
        q[i] *= 0.001
        p[i, rng.randint(n)] = 0.5
        q[i, rng.randint(n)] = 0.45
    exact = np.array([emd_hat(p[i], q[i], mesh30.astype(np.float64))
                      for i in range(b)])
    approx = np.asarray(jax.jit(
        lambda a, c: emd_hat_sinkhorn(a, c, jnp.asarray(mesh30)))(p, q))
    np.testing.assert_allclose(approx, exact, rtol=5e-3, atol=1e-5)


def test_emd_hat_sinkhorn_degenerate_pairs(mesh30):
    import jax.numpy as jnp

    from spatialaudiogen_tpu.ops.sinkhorn import emd_hat_sinkhorn

    n = mesh30.shape[0]
    z = np.zeros((1, n), np.float32)
    # all-zero pair: no mass anywhere -> 0, not NaN (the log floor must be
    # a normal f32; subnormals flush to zero on XLA)
    assert float(emd_hat_sinkhorn(jnp.asarray(z), jnp.asarray(z),
                                  jnp.asarray(mesh30))[0]) == 0.0
    # identical pair: shared mass never moves -> 0
    p = np.random.RandomState(1).rand(1, n).astype(np.float32)
    out = float(emd_hat_sinkhorn(jnp.asarray(p), jnp.asarray(p),
                                 jnp.asarray(mesh30))[0])
    assert abs(out) < 1e-6
    # pure mass mismatch: only the closed-form penalty term
    exact = emd_hat(2 * p[0].astype(np.float64), p[0].astype(np.float64),
                    mesh30.astype(np.float64))
    approx = float(emd_hat_sinkhorn(jnp.asarray(2 * p), jnp.asarray(p),
                                    jnp.asarray(mesh30))[0])
    np.testing.assert_allclose(approx, exact, rtol=1e-3)


def test_ambix_emd_batch_matches_host():
    import jax

    from spatialaudiogen_tpu.ops.sinkhorn import ambix_emd_batch_fn

    rate = 48000
    rng = np.random.RandomState(1)
    b, t = 6, 4800
    pred = rng.randn(b, t, 4).astype(np.float32) * 0.1
    gt = pred + rng.randn(b, t, 4).astype(np.float32) * 0.05
    gt[3] = pred[3]            # identical
    pred[4] *= 1e-6            # silent-ish
    gt[4] *= 1e-6
    fn = jax.jit(ambix_emd_batch_fn(rate, 30.0))
    d1, d2 = map(np.asarray, fn(pred, gt))
    host = [ambix_emd(pred[i], gt[i], rate, ang_res=30) for i in range(b)]
    h1 = np.array([h[0] for h in host])
    h2 = np.array([h[1] for h in host])
    np.testing.assert_allclose(d1, h1, atol=1e-6)   # penalty-dominated
    np.testing.assert_allclose(d2, h2, atol=5e-5)   # transport-dominated


def test_evaluator_sinkhorn_mode_matches_exact(tmp_path):
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

    exact = Evaluator(model_dir, batch_size=3, db_dir=root, emd_ang_res=36)
    s_exact, r_exact = exact.run(output_fn=str(tmp_path / "exact.txt"))
    fast = Evaluator(model_dir, batch_size=3, db_dir=root, emd_ang_res=36,
                     emd_mode="sinkhorn")
    s_fast, r_fast = fast.run(output_fn=str(tmp_path / "fast.txt"))

    assert len(r_exact) == len(r_fast)
    # same battery, EMD agrees to the documented tolerance, everything else
    # is bit-identical (the device path only replaces the EMD columns)
    # f32 device maps + entropic solve vs f64 host LP: sub-0.5% agreement
    np.testing.assert_allclose(s_fast["emd/dir"], s_exact["emd/dir"],
                               rtol=5e-3, atol=5e-4)
    np.testing.assert_allclose(s_fast["emd/dir2"], s_exact["emd/dir2"],
                               rtol=5e-3, atol=5e-4)
    for key in s_exact:
        if key.startswith("emd/"):
            continue
        np.testing.assert_allclose(s_fast[key], s_exact[key], rtol=1e-6,
                                   err_msg=key)
