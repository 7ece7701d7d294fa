"""TPU-native pyramidal Horn-Schunck flow (ops/flow.py)."""

import numpy as np

from spatialaudiogen_tpu.ops.flow import horn_schunck_flow


def _shifted_texture(h=64, w=96, dx=3, dy=-2, seed=0):
    """Smooth random texture and a (dx, dy)-shifted copy (subpixel-exact)."""
    from scipy.ndimage import gaussian_filter, shift

    base = gaussian_filter(np.random.RandomState(seed).rand(h, w), 2.0)
    moved = shift(base, (dy, dx), order=3, mode="nearest")
    f = np.stack([base, moved]).astype(np.float32)
    return np.repeat(f[..., None], 3, axis=-1)


def test_translation_recovered():
    frames = _shifted_texture(dx=3, dy=-2)
    flow = horn_schunck_flow(frames, pair_batch=2)
    assert flow.shape == (2, 64, 96, 2)
    assert np.isfinite(flow).all()
    inner = flow[0, 12:-12, 12:-12]
    assert abs(np.median(inner[..., 0]) - 3.0) < 0.15
    assert abs(np.median(inner[..., 1]) + 2.0) < 0.15


def test_identical_frames_zero_flow():
    frames = _shifted_texture(dx=0, dy=0)
    flow = horn_schunck_flow(frames, pair_batch=2)
    assert np.abs(flow).max() < 1e-4


def test_pair_batching_is_invisible():
    """Chunked solves (zero-padded tail) match one big batch exactly."""
    rng = np.random.RandomState(1)
    from scipy.ndimage import gaussian_filter

    frames = np.stack([gaussian_filter(rng.rand(48, 64), 1.5)
                       for _ in range(5)]).astype(np.float32)
    frames = np.repeat(frames[..., None], 3, axis=-1)
    a = horn_schunck_flow(frames, pair_batch=2)
    b = horn_schunck_flow(frames, pair_batch=8)
    np.testing.assert_allclose(a, b, atol=1e-5)


def test_flow_for_frames_tpu_method(tmp_path):
    """method="tpu" produces the feeder's compressed layout end to end."""
    import os

    from PIL import Image

    from spatialaudiogen_tpu.data.readers import FlowFrameReader
    from spatialaudiogen_tpu.etl.flow import flow_for_frames

    frames = (np.clip(_shifted_texture(h=48, w=64, dx=2, dy=1), 0, 1)
              * 255).astype(np.uint8)
    frames = np.concatenate([frames, frames[-1:]])  # 3 frames
    frames_dir = tmp_path / "video"
    frames_dir.mkdir()
    for i in range(frames.shape[0]):
        Image.fromarray(frames[i]).save(frames_dir / f"{i:06d}.jpg")
    flow_dir = str(tmp_path / "flow")
    flow = flow_for_frames(str(frames_dir), flow_dir, method="tpu")
    assert flow.shape == (3, 48, 64, 2)
    assert os.path.exists(os.path.join(flow_dir, "flow_limits.npy"))
    reader = FlowFrameReader(flow_dir, flow_dir + "/flow_limits.npy", rate=10)
    chunk = reader.get_by_index(0, 2)
    assert chunk.shape == (2, 48, 64, 3)
    assert np.isfinite(chunk).all()
    # the decoded flow's dominant x-direction survives the jpg round trip
    inner = flow[0, 10:-10, 10:-10]
    assert np.median(inner[..., 0]) > 1.0
