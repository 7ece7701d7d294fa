"""On-device evaluation metrics and training loss.

Parity with reference model.py:62-159 evaluation_ops/loss_ops:
  * stft: per-sample STFT-MSE over the pow2-rounded loss STFT (x100)
  * lsd:  log-spectral distance over the comb STFT (window = 0.025*rate)
  * mse:  per-sample temporal MSE (x5e3 in the aggregate)
  * snr:  10*log10((P_signal+0.1)/(P_noise+0.1))
  * pow:  mean signal power diagnostics
All channel metrics are masked by the per-video channel mask and averaged
over the number of videos carrying each channel (model.py:119-126).

Everything is real-matmul DFT (no FFT op on this TPU backend) and jit-safe.
"""

from __future__ import annotations

import jax.numpy as jnp

from spatialaudiogen_tpu.ops.dft import stft_for_loss_real, stft_real

EPS_LSD = 1e-2
EPS_SNR = 1e-1


# Reporting scales applied to the per-sample metrics (model.py:127-145:
# stft x100, mse x5e3); shared with eval.evaluator so eval-detailed.txt and
# the on-device aggregates cannot drift apart.
METRIC_SCALES = {"stft": 100.0, "lsd": 1.0, "mse": 5e3, "snr": 1.0}


def stft_mse_ps(gt, pred, window: int, overlap: int, precision="highest"):
    """Per-sample per-channel STFT MSE: (B, N, C) x2 -> (B, C)."""
    gr, gi = stft_for_loss_real(gt, window, overlap, precision)
    pr, pi = stft_for_loss_real(pred, window, overlap, precision)
    diff2 = (gr - pr) ** 2 + (gi - pi) ** 2          # |gt - pred|^2
    return jnp.mean(jnp.mean(diff2, axis=3), axis=2)


def lsd_ps(gt, pred, window: int, overlap: int, precision="highest"):
    """Per-sample per-channel log-spectral distance: (B, N, C) x2 -> (B, C)."""

    def power_spect_sq(x2):
        # 10*log10(|x| + EPS) with |x| = sqrt(x2)
        return 10.0 * jnp.log(jnp.sqrt(x2) + EPS_LSD) / jnp.log(10.0)

    gr, gi = stft_real(gt.transpose(0, 2, 1), window, overlap, precision=precision)
    pr, pi = stft_real(pred.transpose(0, 2, 1), window, overlap, precision=precision)
    d = power_spect_sq(gr * gr + gi * gi) - power_spect_sq(pr * pr + pi * pi)
    lsd_t = jnp.sqrt(jnp.mean(d ** 2, axis=3))
    return jnp.mean(lsd_t, axis=2)


def temporal_mse_ps(gt, pred):
    return jnp.mean((gt - pred) ** 2, axis=1)


def temporal_snr_ps(gt, pred):
    p_signal = jnp.sum(gt ** 2, axis=1)
    p_noise = jnp.sum((gt - pred) ** 2, axis=1)
    return 10.0 * jnp.log((p_signal + EPS_SNR) / (p_noise + EPS_SNR)) / jnp.log(10.0)


def evaluation_metrics(pred, target, mask_channels, audio_rate: int,
                       precision="highest"):
    """Masked metric battery. pred/target (B, T, C_out); mask (B, C_out).

    Returns (metrics dict of scalars, per_sample dict of (B, C_out) arrays).
    Channel labels follow the reference's YZX order for ambi_order=1.
    """
    window = int(0.025 * audio_rate)     # FFT_WINDOW * rate (definitions.py:10)
    overlap = 2                          # FFT_OVERLAP_R (definitions.py:11)
    num_masked = jnp.maximum(jnp.sum(mask_channels, axis=0), 1.0)

    per_sample = {
        "stft": stft_mse_ps(target, pred, window, overlap, precision),
        "lsd": lsd_ps(target, pred, window, overlap, precision),
        "mse": temporal_mse_ps(target, pred),
        "snr": temporal_snr_ps(target, pred),
    }
    scales = METRIC_SCALES

    metrics = {}
    n_out = pred.shape[2]
    channel_names = "YZX" if n_out == 3 else [str(i) for i in range(n_out)]
    for key, ps in per_sample.items():
        per_channel = jnp.sum(ps * mask_channels, axis=0) / num_masked * scales[key]
        metrics[f"{key}/avg"] = jnp.mean(per_channel)
        for i, ch in zip(range(n_out), channel_names):
            metrics[f"{key}/{ch}"] = per_channel[i]

    metrics["pow/pred"] = jnp.sum(jnp.mean(jnp.mean(pred ** 2, axis=2), axis=0))
    metrics["pow/gt"] = jnp.sum(jnp.mean(jnp.mean(target ** 2, axis=2), axis=0))
    return metrics, per_sample


def training_loss(pred, target, mask_channels, audio_rate: int, params=None,
                  weight_decay: float = 5e-4, decay_exclude=(), precision="highest"):
    """Total loss = masked STFT-MSE x100 (+ L2 regularizers), reference
    model.py:156-159 + train.py:139-144. Returns (total, metrics dict)."""
    metrics, _ = evaluation_metrics(pred, target, mask_channels, audio_rate, precision)
    losses = {"stft/mse": metrics["stft/avg"]}
    total = losses["stft/mse"]
    if params is not None and weight_decay > 0:
        from spatialaudiogen_tpu.models.layers import l2_regularization

        reg = l2_regularization(params, weight_decay, exclude=decay_exclude)
        losses["regularization"] = reg
        total = total + reg
    losses["total_loss"] = total
    return total, {**metrics, **{k: v for k, v in losses.items()}}
