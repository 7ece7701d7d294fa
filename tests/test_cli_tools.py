"""CLI tool tests: encode / binauralize / encode_and_binauralize / power_map."""

import os

import numpy as np
import pytest

from spatialaudiogen_tpu.utils.io_audio import load_wav, save_wav


@pytest.fixture()
def scene(tmp_path):
    rate = 8000
    t = np.arange(rate * 2) / rate
    mono = 0.5 * np.sin(2 * np.pi * 440 * t)
    save_wav(str(tmp_path / "src.wav"), mono, rate)
    pos = tmp_path / "scene-position.txt"
    pos.write_text(
        "s1 src.wav 0.0 0.0 1.0\n"
        "s1 -1.5707 0.0 1.0\n"
        "s1 1.5707 0.0 1.0\n")
    return tmp_path, rate


def test_encode_cli(scene):
    tmp, rate = scene
    from spatialaudiogen_tpu.cli.encode import main

    out = str(tmp / "out-ambix.wav")
    main([str(tmp / "scene-position.txt"), out, "--rate", str(rate)])
    amb, r = load_wav(out)
    assert r == rate and amb.shape[1] == 4
    # source sweeps left->right: Y energy early ~ +, late ~ -
    y = amb[:, 1]
    assert y[: rate // 4].mean() != pytest.approx(0.0, abs=1e-5)
    assert np.abs(amb).max() <= 0.96


def test_encode_and_binauralize_cli(scene):
    tmp, rate = scene
    from spatialaudiogen_tpu.cli.encode_and_binauralize import main

    main([str(tmp / "scene-position.txt"), str(tmp / "o"), "--rate", str(rate)])
    st, _ = load_wav(str(tmp / "o-stereo.wav"))
    amb, _ = load_wav(str(tmp / "o-ambix.wav"))
    assert st.shape[1] == 2 and amb.shape[1] == 4


def test_binauralize_cli_direct(scene):
    tmp, rate = scene
    from spatialaudiogen_tpu.cli.encode import main as enc_main
    from spatialaudiogen_tpu.cli.binauralize import main as bin_main

    enc_main([str(tmp / "scene-position.txt"), str(tmp / "a.wav"), "--rate", str(rate)])
    bin_main([str(tmp / "a.wav"), str(tmp / "st.wav"), "--method", "direct"])
    st, _ = load_wav(str(tmp / "st.wav"))
    assert st.shape[1] == 2
    assert np.abs(st).max() <= 0.96


def test_power_map_cli(scene):
    tmp, rate = scene
    from spatialaudiogen_tpu.cli.encode import main as enc_main
    from spatialaudiogen_tpu.cli.power_map import main as map_main

    enc_main([str(tmp / "scene-position.txt"), str(tmp / "a.wav"), "--rate", str(rate)])
    out = str(tmp / "maps.mp4")
    map_main([str(tmp / "a.wav"), out, "--angular_res", "15"])
    assert os.path.exists(out) and os.path.getsize(out) > 1000

    import cv2

    cap = cv2.VideoCapture(out)
    assert cap.isOpened()
    n = int(cap.get(cv2.CAP_PROP_FRAME_COUNT))
    assert n >= 15  # 2s at 10 maps/sec


def test_enable_compile_cache(tmp_path, monkeypatch):
    """CLIs point JAX's persistent compile cache at a writable dir by
    default (tunnel compiles cost minutes; cached reruns start in seconds)."""
    import jax

    from spatialaudiogen_tpu.utils.jax_setup import enable_compile_cache

    target = str(tmp_path / "cache")
    monkeypatch.setenv("SAG_JAX_CACHE", target)
    used = enable_compile_cache()
    assert used == target
    assert os.path.isdir(target)
    assert jax.config.jax_compilation_cache_dir == target


def test_xyz_cli_modes(scene):
    """--xyz fixed-cartesian one-shots (reference *_xyz.py scripts): encode
    places the source correctly (pure +Y position => W and Y carry the
    signal, X and Z stay ~0), and both binauralize variants emit stereo."""
    tmp, rate = scene
    from spatialaudiogen_tpu.cli.binauralize import main as bin_main
    from spatialaudiogen_tpu.cli.encode import main as enc_main
    from spatialaudiogen_tpu.cli.encode_and_binauralize import main as eb_main

    src = str(tmp / "src.wav")
    out = str(tmp / "xyz-ambix.wav")
    enc_main([src, out, "--xyz", "0", "1", "0"])
    amb, r = load_wav(out)
    assert r == rate and amb.shape[1] == 4
    w, y, z, x = amb.T  # ACN order W, Y, Z, X
    assert np.abs(y).max() > 0.1 and np.abs(w).max() > 0.1
    assert np.abs(x).max() < 1e-6 and np.abs(z).max() < 1e-6

    bin_main([src, str(tmp / "xyz-st.wav"), "--xyz", "0.5", "0.5", "0"])
    st, _ = load_wav(str(tmp / "xyz-st.wav"))
    assert st.shape[1] == 2

    eb_main([src, str(tmp / "xyzo"), "--xyz", "1", "0", "0"])
    st2, _ = load_wav(str(tmp / "xyzo-stereo.wav"))
    amb2, _ = load_wav(str(tmp / "xyzo-ambix.wav"))
    assert st2.shape[1] == 2 and amb2.shape[1] == 4
