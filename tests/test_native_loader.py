"""Native C++ audio window decoder vs the Python reference path."""

import os

import numpy as np
import pytest

from spatialaudiogen_tpu.data.readers import AudioChunkReader
from spatialaudiogen_tpu.data.synthetic import make_synthetic_dataset
from spatialaudiogen_tpu.utils.native import load_native


@pytest.fixture(scope="module")
def ambix_dir(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("natdb"))
    make_synthetic_dataset(root, n_videos=1, duration=4.0, frame_hw=(32, 64), seed=5)
    return os.path.join(root, "synth000", "ambix")


def test_native_lib_has_loader():
    lib = load_native()
    assert lib is not None and hasattr(lib, "sag_decode_wav")


@pytest.mark.parametrize("start,rotation", [
    (0.5, None), (-0.3, 0.8), (1.4, -2.0), (3.2, 1.1), (-1.5, None), (0.9, 3.1)])
def test_native_matches_python(ambix_dir, start, rotation):
    nat = AudioChunkReader(ambix_dir, 48000, 1, use_native=True)
    py = AudioChunkReader(ambix_dir, 48000, 1, use_native=False)
    assert nat._native is not None
    a = nat.get(start, 52799, rotation)
    b = py.get(start, 52799, rotation)
    assert a.dtype == np.float32
    np.testing.assert_allclose(a, b, atol=2e-6)


def test_native_disabled_for_resampled_reads(ambix_dir):
    # resampling stays on the Python path
    reader = AudioChunkReader(ambix_dir, 24000, 1, use_native=True)
    assert reader._native is None
    chunk = reader.get(0.5, 24000)
    assert chunk.shape == (24000, 4)


@pytest.fixture(scope="module")
def video_dir(tmp_path_factory, ambix_dir):
    return os.path.join(os.path.dirname(ambix_dir), "video")


def test_native_jpeg_probe_and_batch(video_dir):
    from spatialaudiogen_tpu.data.readers import VideoFrameReader

    nat = VideoFrameReader(video_dir, use_native=True)
    assert nat._native is not None, "native jpeg decoder unavailable"
    py = VideoFrameReader(video_dir, use_native=False)
    assert py._native is None
    assert nat.raw_shape == py.raw_shape == (32, 64, 3)


@pytest.mark.parametrize("start,size,rotation", [
    (0.0, 1, None), (0.5, 3, None), (1.2, 2, 0.8), (2.0, 4, -2.5),
    (3.7, 5, 3.1),  # clamps past the last frame
])
def test_native_jpeg_matches_pil(video_dir, start, size, rotation):
    """Both PIL and libjpeg must produce identical pixels + identical roll."""
    from spatialaudiogen_tpu.data.readers import VideoFrameReader, img_prep_default

    nat = VideoFrameReader(video_dir, img_prep=img_prep_default, use_native=True)
    py = VideoFrameReader(video_dir, img_prep=img_prep_default, use_native=False)
    a = nat.get_by_index(start, size, rotation)
    b = py.get_by_index(start, size, rotation)
    assert a.shape == b.shape == (size, 32, 64, 3)
    assert a.dtype == np.float32
    np.testing.assert_allclose(a, b, atol=2.0 / 255.0)
    # the overwhelming majority of pixels should be bit-identical
    assert (a == b).mean() > 0.99
