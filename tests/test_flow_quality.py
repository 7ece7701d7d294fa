"""TPU Horn-Schunck flow QUALITY, quantified, and the training path that
consumes it.

Round-3 state: ops/flow.py was pinned on synthetic translations only, so a
quality fork in the flow modality would have been silent. These tests
(a) measure endpoint error and warp-photometric error of `--method tpu`
against Farneback on natural-statistics frames under a known ground-truth
warp, and (b) run the full modality path end to end: frames -> sag-flow
--method tpu -> Feeder -> an audio+flow model TRAINS (loss descends) and
evals. Reference analogue: scraping/flow.py + preprocess.py:156-204 produce
the artifacts feeder.py:135-161 consumes.

Measured on these fixtures (also recorded in PERF.md), alpha=0.05 default
with the round-4 affine pre-alignment + inter-warp 3x3 flow median:
  zoom+pan warps, 96x128 1/f texture: EPE tpu 0.089 px (0.21 in round 3)
  vs farneback 0.021 px (Farneback's polynomial model is exact for affine
  motion — this fixture flatters it; the pure affine fit alone measures
  0.005 px); photometric |I0 - warp(I1)|: tpu 0.0081 still BEATS farneback
  0.0096, both far under the no-flow 0.099 (texture in [0, 1]).
"""

import numpy as np
import pytest


def _natural_texture(h, w, seed=0):
    """1/f-ish texture: multi-scale smoothed noise, normalized to [0, 1].
    Natural-image statistics (power at all scales), unlike a single blob."""
    from scipy.ndimage import gaussian_filter

    rng = np.random.RandomState(seed)
    img = np.zeros((h, w))
    for sigma, amp in ((1.0, 0.25), (3.0, 0.5), (9.0, 1.0)):
        img += amp * gaussian_filter(rng.randn(h, w), sigma)
    img -= img.min()
    return (img / img.max()).astype(np.float32)


def _warp_pair(h=96, w=128, scale=1.02, tx=1.5, ty=-0.8, seed=0):
    """(I0, I1, gt_flow): I1 is I0 under a zoom+pan; gt_flow satisfies the
    estimators' convention I0(p) ~= I1(p + flow(p))."""
    from scipy.ndimage import map_coordinates

    i0 = _natural_texture(h, w, seed)
    ys, xs = np.mgrid[0:h, 0:w].astype(np.float64)
    cy, cx = (h - 1) / 2.0, (w - 1) / 2.0
    # I1(q) = I0(A(q)) with A(q) = c + scale*(q - c) + t  (inverse mapping)
    src_y = cy + scale * (ys - cy) + ty
    src_x = cx + scale * (xs - cx) + tx
    i1 = map_coordinates(i0, [src_y, src_x], order=3, mode="nearest"
                         ).astype(np.float32)
    # flow(p) = A^{-1}(p) - p
    gt_u = (xs - tx - cx) / scale + cx - xs
    gt_v = (ys - ty - cy) / scale + cy - ys
    return i0, i1, np.stack([gt_u, gt_v], axis=-1).astype(np.float32)


def _epe(flow, gt, margin=12):
    d = flow[margin:-margin, margin:-margin] - gt[margin:-margin, margin:-margin]
    return float(np.sqrt((d ** 2).sum(-1)).mean())


def _photometric(i0, i1, flow, margin=12):
    """mean |I0(p) - I1(p + flow(p))| over the interior."""
    from scipy.ndimage import map_coordinates

    h, w = i0.shape
    ys, xs = np.mgrid[0:h, 0:w].astype(np.float64)
    warped = map_coordinates(i1.astype(np.float64),
                             [ys + flow[..., 1], xs + flow[..., 0]],
                             order=1, mode="nearest")
    err = np.abs(i0.astype(np.float64) - warped)
    return float(err[margin:-margin, margin:-margin].mean())


def _rgb(img):
    return np.repeat((img * 255).astype(np.uint8)[..., None], 3, axis=-1)


def test_tpu_flow_epe_and_photometric_vs_farneback():
    """EPE and photometric error of the TPU Horn-Schunck path, quantified
    against Farneback AND ground truth on natural-statistics frames."""
    from spatialaudiogen_tpu.etl.flow import farneback_flow
    from spatialaudiogen_tpu.ops.flow import horn_schunck_flow

    epes, photos = {"tpu": [], "farneback": []}, {"tpu": [], "farneback": []}
    photo_zero = []
    for seed, (scale, tx, ty) in enumerate(
            [(1.02, 1.5, -0.8), (0.985, -2.0, 1.2), (1.0, 2.5, 2.0)]):
        i0, i1, gt = _warp_pair(scale=scale, tx=tx, ty=ty, seed=seed)
        frames = np.stack([_rgb(i0), _rgb(i1)])  # (2, H, W, 3) uint8
        hs = np.asarray(horn_schunck_flow(frames))[0]
        fb = farneback_flow(frames)[0]
        epes["tpu"].append(_epe(hs, gt))
        epes["farneback"].append(_epe(fb, gt))
        photos["tpu"].append(_photometric(i0, i1, hs))
        photos["farneback"].append(_photometric(i0, i1, fb))
        photo_zero.append(_photometric(i0, i1, np.zeros_like(gt)))

    tpu_epe = float(np.mean(epes["tpu"]))
    fb_epe = float(np.mean(epes["farneback"]))
    tpu_ph = float(np.mean(photos["tpu"]))
    fb_ph = float(np.mean(photos["farneback"]))
    zero_ph = float(np.mean(photo_zero))
    print(f"\nflow quality (3 zoom+pan warps, 96x128 natural texture): "
          f"EPE tpu={tpu_epe:.3f}px farneback={fb_epe:.3f}px | "
          f"photometric tpu={tpu_ph:.4f} farneback={fb_ph:.4f} "
          f"no-flow={zero_ph:.4f}")
    # Measured (alpha=0.05, affine init + 3x3 inter-warp median): EPE tpu
    # 0.089 px vs farneback 0.021 px — Farneback's quadratic-polynomial
    # model is EXACT for affine warps, so this fixture flatters it (the
    # affine pre-fit alone measures 0.005 px; the residual is the HS
    # refinement's resampling-noise floor). Photometric: tpu 0.0081 vs
    # farneback 0.0096 (12x better than no-flow 0.099) — the HS field
    # explains the brightness motion BETTER. Pin both characteristics:
    assert tpu_epe < 0.15, (tpu_epe, epes)          # was 0.21 in round 3
    assert fb_epe < 0.1, (fb_epe,)                  # fixture sanity
    assert tpu_ph < 0.1 * zero_ph, (tpu_ph, zero_ph)
    assert tpu_ph < 1.1 * fb_ph, (tpu_ph, fb_ph)    # no photometric fork


def _affine_pair(h=96, w=128, scale=1.02, rot_deg=1.5, tx=1.5, ty=-0.8,
                 seed=0):
    """(I0, I1, gt_flow) under a full similarity warp (rotation included)."""
    from scipy.ndimage import map_coordinates

    i0 = _natural_texture(h, w, seed)
    ys, xs = np.mgrid[0:h, 0:w].astype(np.float64)
    cy, cx = (h - 1) / 2.0, (w - 1) / 2.0
    th = np.deg2rad(rot_deg)
    c, s = np.cos(th), np.sin(th)
    # I1(q) = I0(A(q)), A = c + scale*R*(q - c) + t
    src_x = cx + scale * (c * (xs - cx) - s * (ys - cy)) + tx
    src_y = cy + scale * (s * (xs - cx) + c * (ys - cy)) + ty
    i1 = map_coordinates(i0, [src_y, src_x], order=3, mode="nearest"
                         ).astype(np.float32)
    # flow(p) = A^{-1}(p) - p with A^{-1} = c + R^T/scale * (p - t' ...)
    dx, dy = xs - tx - cx, ys - ty - cy
    gt_u = (c * dx + s * dy) / scale + cx - xs
    gt_v = (-s * dx + c * dy) / scale + cy - ys
    return i0, i1, np.stack([gt_u, gt_v], axis=-1).astype(np.float32)


def test_hard_fixture_jpg_rotation_photometric_noise_ab(tmp_path):
    """Harder realism fixture (VERDICT r4 #4): rotation+zoom+pan warps,
    photometric gain/bias jitter + sensor noise, and REAL jpg encode/decode
    artifacts from the repo's own synthetic-video writer (data/synthetic.py
    _save_jpg, PIL quality=90 — the same path training frames take). A/B:
    TPU Horn-Schunck vs Farneback on identical degraded frames.

    Expected gap to learned flow, stated for the record: FlowNet2-class
    models (what the reference's preprocessing used, scraping/flow.py)
    handle large displacements, occlusion boundaries and textureless
    regions that brightness-constancy solvers cannot — sub-px EPE on
    Sintel-like content where classical methods run 2-10x worse. Neither
    built-in estimator replaces it for checkpoint-parity work (documented
    in cli/flow.py); this fixture bounds the classical solvers' behavior
    under realistic degradation, not the learned-flow gap itself.
    """
    import os

    from PIL import Image

    from spatialaudiogen_tpu.data.synthetic import _save_jpg
    from spatialaudiogen_tpu.etl.flow import farneback_flow
    from spatialaudiogen_tpu.ops.flow import horn_schunck_flow

    rng = np.random.RandomState(42)
    epes, photos, photo_zero = {"tpu": [], "farneback": []}, \
        {"tpu": [], "farneback": []}, []
    for seed, (scale, rot, tx, ty) in enumerate(
            [(1.02, 1.5, 1.5, -0.8), (0.99, -2.0, -1.5, 1.0)]):
        i0, i1, gt = _affine_pair(scale=scale, rot_deg=rot, tx=tx, ty=ty,
                                  seed=10 + seed)
        # photometric degradation: per-frame gain/bias jitter + sensor noise
        i1 = np.clip(i1 * 1.03 + 0.01
                     + rng.randn(*i1.shape).astype(np.float32) / 255.0, 0, 1)
        i0 = np.clip(i0 + rng.randn(*i0.shape).astype(np.float32) / 255.0, 0, 1)
        frames = []
        for k, im in enumerate((i0, i1)):
            fn = str(tmp_path / f"f{seed}_{k}.jpg")
            _save_jpg(fn, np.repeat((im * 255).astype(np.uint8)[..., None],
                                    3, axis=-1))
            frames.append(np.asarray(Image.open(fn)))
        frames = np.stack(frames)
        hs = np.asarray(horn_schunck_flow(frames))[0]
        fb = farneback_flow(frames)[0]
        epes["tpu"].append(_epe(hs, gt))
        epes["farneback"].append(_epe(fb, gt))
        photos["tpu"].append(_photometric(i0, i1, hs))
        photos["farneback"].append(_photometric(i0, i1, fb))
        photo_zero.append(_photometric(i0, i1, np.zeros_like(gt)))
    tpu_epe, fb_epe = np.mean(epes["tpu"]), np.mean(epes["farneback"])
    print(f"\nhard fixture (jpg q90 + rotation + photometric noise): "
          f"EPE tpu={tpu_epe:.3f}px farneback={fb_epe:.3f}px | photometric "
          f"tpu={np.mean(photos['tpu']):.4f} fb={np.mean(photos['farneback']):.4f} "
          f"no-flow={np.mean(photo_zero):.4f}")
    # both classical solvers must survive the degradation; the HS field must
    # stay within 2.5x of Farneback's EPE (its affine-exact advantage) and
    # under an absolute 0.35 px on this still-mostly-affine content
    assert tpu_epe < 0.35, (tpu_epe, epes)
    assert tpu_epe < 2.5 * fb_epe + 0.05, (tpu_epe, fb_epe)
    assert np.mean(photos["tpu"]) < 0.35 * np.mean(photo_zero)


def test_blob_occlusion_fb_consistency():
    """fb_occlusion=True (forward-backward consistency gating of the data
    term, ops/flow.py _occlusion_weight) recovers MORE of the blob's local
    motion than the default solve, without disturbing the background.
    Measured: blob 2.459 -> 2.553 of the true 3 px, bg -1.008 both; the
    zoom+pan EPE cost of the extra full-res refine is +0.009 px (0.089 ->
    0.098, still under the 0.15 pin) — why the flag is opt-in
    (sag-flow --fb_occlusion) rather than the default."""
    from scipy.ndimage import gaussian_filter, shift

    from spatialaudiogen_tpu.ops.flow import horn_schunck_flow

    rng = np.random.RandomState(3)
    bg = gaussian_filter(rng.rand(96, 128), 2.0)
    ys, xs = np.mgrid[0:96, 0:128]
    mask = np.exp(-(((xs - 64) ** 2 + (ys - 48) ** 2) / 120.0))
    fg = gaussian_filter(rng.rand(96, 128), 1.5)
    f0 = bg * (1 - mask) + fg * mask
    m1 = shift(mask, (0, 3), order=3, mode="nearest")
    f1 = (shift(bg, (0, -1), order=3, mode="nearest") * (1 - m1)
          + shift(fg, (0, 3), order=3, mode="nearest") * m1)
    frames = np.stack([_rgb(np.clip(f0, 0, 1)), _rgb(np.clip(f1, 0, 1))])
    base = np.asarray(horn_schunck_flow(frames))[0]
    occl = np.asarray(horn_schunck_flow(frames, fb_occlusion=True))[0]
    blob_base = float(base[..., 0][mask > 0.5].mean())
    blob_occl = float(occl[..., 0][mask > 0.5].mean())
    assert blob_occl > blob_base + 0.05, (blob_base, blob_occl)
    assert blob_occl > 2.5, blob_occl
    assert abs(float(occl[..., 0][mask < 0.05].mean()) + 1.0) < 0.35


def test_blob_occlusion_local_motion_survives_median():
    """A blob moving +3 px in x over a background moving -1 px: the global
    affine fit and the inter-warp median must NOT average the blob's local
    motion away. Pins the robustness trade recorded in ops/flow.py
    (measured 2.46/3 px; 5x5 medians drop it to 2.20, alpha=0.07 to 1.65)."""
    from scipy.ndimage import gaussian_filter, shift

    from spatialaudiogen_tpu.ops.flow import horn_schunck_flow

    rng = np.random.RandomState(3)
    bg = gaussian_filter(rng.rand(96, 128), 2.0)
    ys, xs = np.mgrid[0:96, 0:128]
    mask = np.exp(-(((xs - 64) ** 2 + (ys - 48) ** 2) / 120.0))
    fg = gaussian_filter(rng.rand(96, 128), 1.5)
    f0 = bg * (1 - mask) + fg * mask
    m1 = shift(mask, (0, 3), order=3, mode="nearest")
    f1 = (shift(bg, (0, -1), order=3, mode="nearest") * (1 - m1)
          + shift(fg, (0, 3), order=3, mode="nearest") * m1)
    frames = np.stack([_rgb(np.clip(f0, 0, 1)), _rgb(np.clip(f1, 0, 1))])
    flow = np.asarray(horn_schunck_flow(frames))[0]
    blob_u = float(flow[..., 0][mask > 0.5].mean())
    bg_sel = mask < 0.05
    bg_u = float(flow[..., 0][bg_sel].mean())
    assert blob_u > 2.2, blob_u            # blob motion recovered (3 true)
    assert abs(bg_u + 1.0) < 0.35, bg_u    # background motion (-1 true)


def test_audio_flow_model_trains_on_tpu_flow_artifacts(tmp_path):
    """sag-flow --method tpu artifacts feed an audio+flow model end to end:
    loss descends over 20 steps and the evaluator scores a batch."""
    import json
    import os

    from spatialaudiogen_tpu.cli.flow import main as flow_main
    from spatialaudiogen_tpu.config import TrainConfig
    from spatialaudiogen_tpu.data.synthetic import make_synthetic_dataset
    from spatialaudiogen_tpu.eval.evaluator import Evaluator
    from spatialaudiogen_tpu.train.trainer import Trainer

    root = str(tmp_path / "db")
    ids = make_synthetic_dataset(root, n_videos=1, duration=3.0,
                                 frame_hw=(64, 128), seed=5)
    db = str(tmp_path / "db.lst")
    with open(db, "w") as f:
        f.write("\n".join(ids) + "\n")
    flow_main([db, "--frames_dir", root, "--method", "tpu"])
    assert os.path.exists(os.path.join(root, ids[0], "flow", "flow_limits.npy"))

    model_dir = str(tmp_path / "model")
    cfg = TrainConfig(db_dir=root, model_dir=model_dir,
                      encoders=("audio", "flow"), separation="none",
                      n_iters=20, batch_size=2, n_workers=2,
                      frame_hw=(64, 128), log_every=1, ckpt_every=0,
                      n_data=1, seed=0)
    Trainer(cfg).train()
    losses = [json.loads(line)["total_loss"]
              for line in open(os.path.join(model_dir, "metrics.jsonl"))
              if "total_loss" in line]
    assert len(losses) >= 16
    # feeder worker scheduling reorders batches run to run, so single-step
    # comparisons are noisy; the descent signal is mean(last 3) vs
    # mean(first 3) over 20 steps (measured 1745 -> 992 on this seed)
    assert np.mean(losses[-3:]) < np.mean(losses[:3]), losses
    assert np.isfinite(losses).all(), losses

    ev = Evaluator(model_dir, batch_size=2, n_workers=2)
    summary, results = ev.run(host_threads=2, max_batches=1, print_every=0)
    assert results and np.isfinite(summary["stft/avg"]), summary

    # deploy: flow-encoder configs take the per-window host-assembly path
    # (deploy.py _predict_span_host) — the one deploy route not otherwise
    # driven by a flow model anywhere in the suite
    from spatialaudiogen_tpu.deploy.deploy import MonoToAmbix

    model = MonoToAmbix(model_dir, batch_size=2)
    out = model.deploy(os.path.join(root, ids[0]), 0.5, 1.0)
    assert out.shape == (48000, 4), out.shape
    assert np.isfinite(out).all()
