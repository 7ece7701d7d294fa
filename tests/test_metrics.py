"""Evaluation-metric battery semantics."""

import jax.numpy as jnp
import numpy as np
import pytest

from spatialaudiogen_tpu.models.metrics import (
    evaluation_metrics,
    lsd_ps,
    stft_mse_ps,
    temporal_mse_ps,
    temporal_snr_ps,
    training_loss,
)


def test_identical_signals_zero_distance():
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(2, 4800, 3), jnp.float32)
    mask = jnp.ones((2, 3))
    m, _ = evaluation_metrics(x, x, mask, 48000)
    assert float(m["stft/avg"]) == pytest.approx(0.0, abs=1e-4)
    assert float(m["mse/avg"]) == pytest.approx(0.0, abs=1e-6)
    assert float(m["lsd/avg"]) == pytest.approx(0.0, abs=1e-3)
    # SNR of identical signals: 10*log10((P+.1)/(0+.1)) — large positive
    assert float(m["snr/avg"]) > 30.0


def test_mask_zeroes_out_missing_channels():
    rng = np.random.RandomState(1)
    gt = jnp.asarray(rng.randn(4, 4800, 3), jnp.float32)
    pred = jnp.asarray(rng.randn(4, 4800, 3), jnp.float32)
    full = jnp.ones((4, 3))
    nz = full.at[:, 1].set(0.0)  # all videos lack channel Z
    m_full, _ = evaluation_metrics(gt, pred, full, 48000)
    m_masked, _ = evaluation_metrics(gt, pred, nz, 48000)
    assert float(m_masked["stft/Z"]) == pytest.approx(0.0, abs=1e-9)
    assert float(m_masked["stft/Y"]) == pytest.approx(float(m_full["stft/Y"]), rel=1e-6)
    # avg over channels includes the zeroed one (reference semantics)
    assert float(m_masked["stft/avg"]) < float(m_full["stft/avg"])


def test_snr_formula():
    gt = jnp.ones((1, 100, 1))
    pred = jnp.zeros((1, 100, 1))
    snr = np.asarray(temporal_snr_ps(gt, pred))
    expected = 10 * np.log10((100 + 0.1) / (100 + 0.1))
    assert snr[0, 0] == pytest.approx(expected, abs=1e-5)


def test_mse_scaling():
    gt = jnp.zeros((1, 4800, 3))
    pred = jnp.full((1, 4800, 3), 0.1)
    m, _ = evaluation_metrics(gt, pred, jnp.ones((1, 3)), 48000)
    assert float(m["mse/avg"]) == pytest.approx(0.01 * 5e3, rel=1e-4)


def test_training_loss_includes_regularizer():
    rng = np.random.RandomState(2)
    gt = jnp.asarray(rng.randn(2, 4800, 3), jnp.float32)
    pred = jnp.asarray(rng.randn(2, 4800, 3), jnp.float32)
    mask = jnp.ones((2, 3))
    params = {"layer": {"kernel": jnp.ones((4, 4))}}
    total, metrics = training_loss(pred, gt, mask, 48000, params=params)
    assert float(metrics["regularization"]) == pytest.approx(0.5 * 5e-4 * 16, rel=1e-6)
    assert float(total) == pytest.approx(
        float(metrics["stft/mse"]) + float(metrics["regularization"]), rel=1e-6)


def test_lsd_matches_manual():
    rng = np.random.RandomState(3)
    gt = jnp.asarray(rng.randn(1, 4800, 2), jnp.float32)
    pred = jnp.asarray(rng.randn(1, 4800, 2), jnp.float32)
    got = np.asarray(lsd_ps(gt, pred, 1200, 2))

    from spatialaudiogen_tpu.dsp import stft

    def power(x):
        return 10 * np.log10(np.abs(x) + 1e-2)

    sg = np.asarray(stft(np.asarray(gt).transpose(0, 2, 1), 1200, 2))
    sp = np.asarray(stft(np.asarray(pred).transpose(0, 2, 1), 1200, 2))
    ref = np.mean(np.sqrt(np.mean((power(sg) - power(sp)) ** 2, axis=3)), axis=2)
    np.testing.assert_allclose(got, ref, atol=1e-3)
