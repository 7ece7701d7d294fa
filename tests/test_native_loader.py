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
    assert lib is not None and hasattr(lib, "sag_read_window")


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
