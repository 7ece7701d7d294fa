"""ImageNet-style image preprocessing (host-side numpy).

Parity with pyutils/tflib/models/image/preprocessing.py (distort/eval crops
used by the ResNet self-tests) plus the ResNet18 normalization chain
(resnet.py:111-121). These run on the host feeder workers; on-device the
model consumes already-normalized floats.
"""

from __future__ import annotations

import numpy as np

IMAGENET_MEAN_BGR_CENTERED = np.array([-117.0, -117.0, -117.0], np.float32)
IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
IMAGENET_STD = np.array([0.229, 0.224, 0.225], np.float32)


def _resize(img: np.ndarray, hw) -> np.ndarray:
    import cv2

    return cv2.resize(img, (hw[1], hw[0]), interpolation=cv2.INTER_LINEAR)


def eval_image(img: np.ndarray, out_h: int, out_w: int,
               central_fraction: float = 0.875) -> np.ndarray:
    """Central crop by `central_fraction`, then resize (preprocessing.py eval)."""
    h, w = img.shape[:2]
    ch, cw = int(h * central_fraction), int(w * central_fraction)
    y0, x0 = (h - ch) // 2, (w - cw) // 2
    return _resize(img[y0:y0 + ch, x0:x0 + cw], (out_h, out_w))


def distort_image(img: np.ndarray, out_h: int, out_w: int,
                  rng: np.random.RandomState | None = None,
                  min_area: float = 0.5) -> np.ndarray:
    """Random area/aspect crop + horizontal flip (training distortion)."""
    rng = rng or np.random.RandomState()
    h, w = img.shape[:2]
    for _ in range(10):
        area = rng.uniform(min_area, 1.0) * h * w
        aspect = rng.uniform(3 / 4, 4 / 3)
        ch = int(round(np.sqrt(area / aspect)))
        cw = int(round(np.sqrt(area * aspect)))
        if ch <= h and cw <= w:
            y0 = rng.randint(0, h - ch + 1)
            x0 = rng.randint(0, w - cw + 1)
            img = img[y0:y0 + ch, x0:x0 + cw]
            break
    out = _resize(img, (out_h, out_w))
    if rng.rand() < 0.5:
        out = out[:, ::-1]
    return out


def imagenet_normalize(img: np.ndarray) -> np.ndarray:
    """uint8 RGB -> standard ImageNet-normalized float (resnet.py:117-121)."""
    x = img.astype(np.float32) / 255.0
    return (x - IMAGENET_MEAN) / IMAGENET_STD


def model_normalize(img: np.ndarray) -> np.ndarray:
    """The training-path normalization (myutils.py:88-89): x/255 - 0.5."""
    return img.astype(np.float32) / 255.0 - 0.5
