"""Embedded binaural decode filters (ambisonics/binaural_filters.py).

The reference vendors Google's symmetric-ambisonic-binaural-decoder wav set
(3rd-party/spatial-media/spatial-audio/) so HRTF binauralization works with
no user data; here the equivalent filter set is DERIVED (t-design decode x
Brown-Duda spherical-head HRIRs) and these tests pin its physics: symmetry,
ITD/ILD lateralization, DC behavior, and the use_hrtfs-without-CIPIC
dispatch in AmbisonicBinauralizer and the sag-binauralize CLI.
"""

import numpy as np
import pytest

from spatialaudiogen_tpu.ambisonics.binaural_filters import (
    DEFAULT_TAPS,
    AmbisonicFilterBinauralizer,
    make_binaural_decoder_filters,
    spherical_head_hrir,
)
from spatialaudiogen_tpu.ambisonics.encoder import AmbiEncoder
from spatialaudiogen_tpu.ambisonics.format import AmbiFormat
from spatialaudiogen_tpu.ambisonics.position import Position, PositionalSource

RATE = 48000


def _encode_point(signal: np.ndarray, direction, fmt: AmbiFormat) -> np.ndarray:
    pos = Position(*direction, "cartesian")
    return AmbiEncoder(fmt).encode(
        [PositionalSource(signal, pos, fmt.sample_rate)]).data


def _click_train(n: int = 4800) -> np.ndarray:
    sig = np.zeros(n)
    sig[480::960] = 1.0
    return sig


def test_hrir_symmetry_and_itd():
    # left/right ears mirror when the source mirrors in y
    l1, r1 = spherical_head_hrir([0.3, 0.8, 0.1], RATE)
    l2, r2 = spherical_head_hrir([0.3, -0.8, 0.1], RATE)
    np.testing.assert_allclose(l1, r2, atol=1e-12)
    np.testing.assert_allclose(r1, l2, atol=1e-12)
    # a hard-left source reaches the left ear earlier and louder
    left, right = spherical_head_hrir([0.0, 1.0, 0.0], RATE)
    assert np.argmax(np.abs(left)) < np.argmax(np.abs(right))
    assert np.sum(left ** 2) > 2.0 * np.sum(right ** 2)
    # frontal source: both ears identical by symmetry
    lf, rf = spherical_head_hrir([1.0, 0.0, 0.0], RATE)
    np.testing.assert_allclose(lf, rf, atol=1e-12)


def test_hrir_dc_gain_is_unshadowed():
    # the Brown-Duda shadow is all-pass at DC: every direction's HRIR sums
    # to ~1 (delay only moves energy in time)
    for d in ([1, 0, 0], [0, 1, 0], [0, 0, 1], [-1, 0, 0], [0.5, -0.5, 0.7]):
        left, right = spherical_head_hrir(d, RATE)
        assert abs(np.sum(left) - 1.0) < 0.05, d
        assert abs(np.sum(right) - 1.0) < 0.05, d


def test_filter_set_shape_and_symmetry():
    f = make_binaural_decoder_filters(order=1, sample_rate=RATE)
    assert f.shape == (2, 4, DEFAULT_TAPS)
    # deterministic (cached and rebuilt agree)
    np.testing.assert_array_equal(f, make_binaural_decoder_filters(1, RATE))
    # ACN order-1 = [W, Y, Z, X]: the symmetric (cube) layout makes W/Z/X
    # filters identical across ears and the Y filter anti-symmetric —
    # exactly the structure of Google's "symmetric" decoder (its README:
    # one filter per channel, Y routed with a 180-degree inversion)
    for ch in (0, 2, 3):
        np.testing.assert_allclose(f[0, ch], f[1, ch], atol=1e-10)
    np.testing.assert_allclose(f[0, 1], -f[1, 1], atol=1e-10)


def test_lateralization_of_encoded_sources():
    fmt = AmbiFormat(order=1, sample_rate=RATE)
    bin_ = AmbisonicFilterBinauralizer(fmt)
    sig = _click_train()
    left_src = bin_.binauralize(_encode_point(sig, (0.0, 1.0, 0.0), fmt))
    assert left_src.shape == (len(sig), 2)
    e_l, e_r = np.sum(left_src ** 2, axis=0)
    assert e_l > 1.5 * e_r, (e_l, e_r)
    # and the mirrored source mirrors the stereo image
    right_src = bin_.binauralize(_encode_point(sig, (0.0, -1.0, 0.0), fmt))
    np.testing.assert_allclose(left_src[:, 0], right_src[:, 1], atol=1e-10)
    # frontal source images center
    front = bin_.binauralize(_encode_point(sig, (1.0, 0.0, 0.0), fmt))
    np.testing.assert_allclose(front[:, 0], front[:, 1], atol=1e-10)


def test_ambisonic_binauralizer_dispatches_to_embedded_filters():
    from spatialaudiogen_tpu.ambisonics.binauralizer import AmbisonicBinauralizer

    fmt = AmbiFormat(order=1, sample_rate=RATE)
    rng = np.random.RandomState(0)
    ambi = rng.randn(2000, 4) * 0.1
    a = AmbisonicBinauralizer(fmt, use_hrtfs=True, cipic_dir=None).binauralize(ambi)
    b = AmbisonicFilterBinauralizer(fmt).binauralize(ambi)
    np.testing.assert_array_equal(a, b)


def test_higher_order_filters():
    f = make_binaural_decoder_filters(order=2, sample_rate=RATE)
    assert f.shape == (2, 9, DEFAULT_TAPS)
    fmt = AmbiFormat(order=2, sample_rate=RATE)
    out = AmbisonicFilterBinauralizer(fmt).binauralize(
        _encode_point(_click_train(2400), (0.0, 1.0, 0.0), fmt))
    e_l, e_r = np.sum(out ** 2, axis=0)
    assert e_l > 1.5 * e_r


def test_cli_binauralize_use_hrtfs_without_cipic(tmp_path):
    from spatialaudiogen_tpu.cli.binauralize import main as binauralize_main
    from spatialaudiogen_tpu.utils.io_audio import load_wav, save_wav

    fmt = AmbiFormat(order=1, sample_rate=RATE)
    ambi = _encode_point(_click_train(), (0.0, 1.0, 0.0), fmt)
    in_fn = str(tmp_path / "foa.wav")
    out_fn = str(tmp_path / "stereo.wav")
    save_wav(in_fn, ambi * 0.25, RATE, subtype="float32")
    binauralize_main([in_fn, out_fn, "--use_hrtfs"])
    stereo, rate = load_wav(out_fn)
    assert rate == RATE and stereo.shape[1] == 2
    e_l, e_r = np.sum(stereo ** 2, axis=0)
    assert e_l > 1.5 * e_r  # left-panned source stays left through the CLI
