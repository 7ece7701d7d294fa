"""First-order ambisonic rotations (azimuth) used by training augmentation.

The training feeder rotates FOA chunks around the vertical axis; the matrix
matches reference feeder.py:93-101 for ACN ordering [W, Y, Z, X]:

    W' = W
    Y' = X sin(a) + Y cos(a)
    Z' = Z
    X' = X cos(a) - Y sin(a)

`rotate_foa` applies it to (T, 4) chunks (numpy or jnp arrays).
"""

from __future__ import annotations

import numpy as np


def foa_rotation_matrix(rotation: float) -> np.ndarray:
    """4x4 ACN rotation matrix R; apply as chunk @ R.T."""
    assert -np.pi <= rotation < np.pi
    c, s = np.cos(rotation), np.sin(rotation)
    return np.array([
        [1, 0, 0, 0],   # W' = W
        [0, c, 0, s],   # Y' = X sin + Y cos
        [0, 0, 1, 0],   # Z' = Z
        [0, -s, 0, c],  # X' = X cos - Y sin
    ])


def rotate_foa(chunk, rotation: float):
    """Rotate an ACN/SN3D FOA chunk (..., 4) by `rotation` radians azimuth."""
    rot = foa_rotation_matrix(rotation)
    if hasattr(chunk, "dtype") and chunk.dtype != rot.dtype:
        rot = rot.astype(chunk.dtype)  # keep f32 feeder chunks out of f64
    return chunk @ rot.T
