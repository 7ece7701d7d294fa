"""CIPIC HRTF path: loader, nearest lookup, Convolvotron, SourceBinauralizer.

The reference ships no CIPIC data (hrir.py:44-49 points at an external
database), so this builds a synthetic mini-HRIR grid — per-azimuth wav
files in the exact 23x50 CIPIC layout (reference hrir.py:10-41) with
identifying impulses — and pins:

  * wav layout decode + the time-flip on load
  * interaural->head coordinate conversion + KDTree nearest lookup
  * Convolvotron.binauralize against closed-form convolution and its
    per-frame variant (reference binauralizer.py:58-90)
  * SourceBinauralizer(use_hrtfs=True) dispatch (binauralizer.py:93-121)
"""

import numpy as np
import pytest

from spatialaudiogen_tpu.ambisonics.binauralizer import (
    Convolvotron,
    SourceBinauralizer,
)
from spatialaudiogen_tpu.ambisonics.hrir import (
    CIPIC_AZIMUTHS,
    CIPIC_ELEVATIONS,
    CipicHRIR,
)
from spatialaudiogen_tpu.ambisonics.position import Position, PositionalSource
from spatialaudiogen_tpu.utils.io_audio import save_wav

N_TAPS = 200
RATE = 44100


def _code(az_idx: int, el_idx: int, ear: int) -> float:
    """Unique, float32-exact amplitude for grid entry (az, el, ear)."""
    return (az_idx * 64 + el_idx + 1) * (1 if ear == 0 else -1) / 2048.0


@pytest.fixture(scope="module")
def cipic_dir(tmp_path_factory):
    """Synthetic CIPIC directory: each (az, el, ear) HRIR is a delayed
    impulse delta[t - el_idx] scaled by a unique code. Files store the
    TIME-REVERSED response (the loader flips axis 0, hrir.py wav layout)."""
    d = tmp_path_factory.mktemp("cipic")
    for i, az in enumerate(CIPIC_AZIMUTHS):
        stem = ("neg" if az < 0 else "") + str(abs(az))
        for ear, name in ((0, "left"), (1, "right")):
            data = np.zeros((N_TAPS, len(CIPIC_ELEVATIONS)), np.float32)
            for j in range(len(CIPIC_ELEVATIONS)):
                # loader does np.flip(axis=0): place at N_TAPS-1-j so the
                # loaded HRIR reads code at tap index j
                data[N_TAPS - 1 - j, j] = _code(i, j, ear)
            save_wav(str(d / f"{stem}az{name}.wav"), data, RATE,
                     subtype="float32")
    return str(d)


def _grid_direction(az_deg: float, el_deg: float) -> Position:
    """CIPIC interaural (az, el) -> head-coordinate unit Position, mirroring
    the loader's conversion (hrir.py:44-47: x front, y left)."""
    az, el = np.deg2rad(az_deg), np.deg2rad(el_deg)
    xp = np.cos(el) * np.sin(az)
    yp = np.cos(el) * np.cos(az)
    zp = np.sin(el)
    return Position(yp, -xp, zp, "cartesian")


def test_loader_layout_and_flip(cipic_dir):
    db = CipicHRIR(cipic_dir)
    assert db.left_hrir.shape == (N_TAPS, 23, 50)
    # flip on load: the code planted at wav row N-1-j must surface at tap j
    for (i, j) in [(0, 0), (11, 8), (22, 49)]:
        assert db.left_hrir[j, i, j] == pytest.approx(_code(i, j, 0))
        assert db.right_hrir[j, i, j] == pytest.approx(_code(i, j, 1))
        assert np.count_nonzero(db.left_hrir[:, i, j]) == 1


@pytest.mark.parametrize("az_idx,el_idx", [(11, 8), (0, 0), (22, 40), (5, 24)])
def test_get_closest_exact_grid_direction(cipic_dir, az_idx, el_idx):
    db = CipicHRIR(cipic_dir)
    pos = _grid_direction(CIPIC_AZIMUTHS[az_idx], CIPIC_ELEVATIONS[el_idx])
    p, left, right = db.get_closest(pos)
    assert left[el_idx] == pytest.approx(_code(az_idx, el_idx, 0))
    assert right[el_idx] == pytest.approx(_code(az_idx, el_idx, 1))
    # the returned grid position is the query direction (unit-normalized)
    q = pos.coords("cartesian")
    g = p.coords("cartesian")
    np.testing.assert_allclose(g / np.linalg.norm(g),
                               q / np.linalg.norm(q), atol=1e-12)


def test_get_closest_perturbed_snaps_to_nearest(cipic_dir):
    db = CipicHRIR(cipic_dir)
    az_idx, el_idx = 11, 8  # az=0, el=0 (straight ahead)
    pos = _grid_direction(CIPIC_AZIMUTHS[az_idx] + 2.0,
                          CIPIC_ELEVATIONS[el_idx] - 2.4)
    _, left, _ = db.get_closest(pos)
    assert left[el_idx] == pytest.approx(_code(az_idx, el_idx, 0))


def test_convolvotron_matches_closed_form(cipic_dir):
    conv = Convolvotron(cipic_dir)
    rng = np.random.RandomState(0)
    sig = rng.randn(1000)
    pos = _grid_direction(CIPIC_AZIMUTHS[3], CIPIC_ELEVATIONS[7])
    src = PositionalSource(sig, pos, RATE)
    out = conv.binauralize(src)
    assert out.shape == (1000, 2)
    _, left_h, right_h = conv.hrir_db.get_closest(pos)
    # reference semantics (binauralizer.py:70-81): "valid" correlation with
    # the time-reversed HRIR placed from i_start = n_taps - 1; equivalently
    # out[t] = sum_k sig[t - (N-1) + k] * h[k] for t >= N-1, 0 before
    expect = np.zeros((1000, 2))
    for t in range(N_TAPS - 1, 1000):
        seg = sig[t - (N_TAPS - 1): t + 1]
        expect[t, 0] = np.dot(seg, left_h)
        expect[t, 1] = np.dot(seg, right_h)
    np.testing.assert_allclose(out, expect, atol=1e-10)


def test_convolvotron_frame_matches_batch(cipic_dir):
    conv = Convolvotron(cipic_dir)
    rng = np.random.RandomState(1)
    sig = rng.randn(600)
    pos = _grid_direction(CIPIC_AZIMUTHS[15], CIPIC_ELEVATIONS[30])
    src = PositionalSource(sig, pos, RATE)
    batch = conv.binauralize(src)
    frame = np.zeros((600, 2))
    for t in (N_TAPS - 1, 300, 599):
        conv.binauralize_frame(src, frame, t)
        np.testing.assert_allclose(frame[t], batch[t], atol=1e-10)


def _write_pcm16_wav_bytes(path: str, int16_frames: np.ndarray, rate: int):
    """Write a multi-channel PCM16 RIFF from first principles — raw
    struct.pack bytes, deliberately independent of utils.io_audio.save_wav,
    so the loader's on-disk contract is pinned against the wav SPEC (the
    layout real CIPIC per-azimuth files use, reference hrir.py:10-41) and
    not against this repo's own writer."""
    import struct

    n_frames, n_channels = int16_frames.shape
    payload = int16_frames.astype("<i2").tobytes()  # frame-interleaved
    block_align = n_channels * 2
    with open(path, "wb") as f:
        f.write(b"RIFF" + struct.pack("<I", 36 + len(payload)) + b"WAVE")
        f.write(b"fmt " + struct.pack("<IHHIIHH", 16, 1, n_channels, rate,
                                      rate * block_align, block_align, 16))
        f.write(b"data" + struct.pack("<I", len(payload)) + payload)


def test_reference_layout_bytes_contract(tmp_path):
    """A CIPIC directory built from hand-written PCM16 RIFF bytes (the real
    database's column-file layout: one wav per azimuth and ear, channels =
    the 50 elevations, rows = time-reversed taps) loads correctly through
    CipicHRIR — azimuth stem naming ('neg80az...'), channel->elevation
    mapping, the time flip, and the int16/32768 decode."""
    d = tmp_path / "cipic_bytes"
    d.mkdir()
    n_el = len(CIPIC_ELEVATIONS)
    for i, az in enumerate(CIPIC_AZIMUTHS):
        stem = ("neg" if az < 0 else "") + str(abs(az))
        for ear, name in ((0, "left"), (1, "right")):
            frames = np.zeros((N_TAPS, n_el), np.int16)
            for j in range(n_el):
                # integer codes decode EXACTLY as k/32768 (io_audio PCM16
                # convention); row N-1-j surfaces at tap j after the flip
                frames[N_TAPS - 1 - j, j] = (i * 64 + j + 1) * (1, -1)[ear]
            _write_pcm16_wav_bytes(str(d / f"{stem}az{name}.wav"), frames, RATE)
    db = CipicHRIR(str(d))
    assert db.left_hrir.shape == (N_TAPS, 23, 50)
    for (i, j) in [(0, 0), (11, 8), (22, 49), (7, 31)]:
        assert db.left_hrir[j, i, j] == (i * 64 + j + 1) / 32768.0
        assert db.right_hrir[j, i, j] == -(i * 64 + j + 1) / 32768.0
        assert np.count_nonzero(db.left_hrir[:, i, j]) == 1
    # nearest lookup over the byte-built grid returns the planted column
    p, left, right = db.get_closest(
        _grid_direction(CIPIC_AZIMUTHS[11], CIPIC_ELEVATIONS[8]))
    assert left[8] == (11 * 64 + 8 + 1) / 32768.0


def test_source_binauralizer_hrtf_dispatch(cipic_dir):
    sb = SourceBinauralizer(use_hrtfs=True, cipic_dir=cipic_dir)
    rng = np.random.RandomState(2)
    sigs = rng.randn(2, 500)
    positions = [_grid_direction(CIPIC_AZIMUTHS[2], CIPIC_ELEVATIONS[10]),
                 _grid_direction(CIPIC_AZIMUTHS[20], CIPIC_ELEVATIONS[44])]
    sources = [PositionalSource(sigs[k], positions[k], RATE) for k in range(2)]
    out = sb.binauralize(sources)
    conv = Convolvotron(cipic_dir)
    expect = conv.binauralize([sources[0]]) + conv.binauralize([sources[1]])
    np.testing.assert_allclose(out, expect, atol=1e-10)
    # HRTF path really engaged: delayed-impulse HRIRs mean the left channel
    # carries each source scaled by its (positive) left code, the right by
    # the negative right code
    assert not np.allclose(out[:, 0], out[:, 1])
