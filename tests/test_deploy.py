"""Deploy path tests: sliding-window inference, SA3D injection, mux dry-run."""

import os
import struct

import numpy as np
import pytest

from spatialaudiogen_tpu.config import TrainConfig
from spatialaudiogen_tpu.data.synthetic import make_synthetic_dataset
from spatialaudiogen_tpu.deploy.deploy import MonoToAmbix
from spatialaudiogen_tpu.deploy.mux import binauralize_stereo, gen_360video
from spatialaudiogen_tpu.deploy.sa3d import (
    Box,
    SPHERICAL_UUID,
    inject_spatial_metadata,
    make_sa3d_box,
    parse_top_level,
)
from spatialaudiogen_tpu.train.trainer import Trainer


@pytest.fixture(scope="module")
def trained(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("deploydb"))
    make_synthetic_dataset(root, n_videos=1, duration=4.0, frame_hw=(64, 128), seed=7)
    model_dir = str(tmp_path_factory.mktemp("deploymodel"))
    cfg = TrainConfig(db_dir=root, model_dir=model_dir, encoders=("audio",),
                      separation="none", n_iters=2, batch_size=2, n_workers=1,
                      log_every=10, ckpt_every=0, n_data=1)
    Trainer(cfg).train()
    return root, model_dir


def test_deploy_shapes_and_mono_passthrough(trained):
    root, model_dir = trained
    model = MonoToAmbix(model_dir, batch_size=4)
    ambi = model.deploy(os.path.join(root, "synth000"), deploy_start=0.5,
                        deploy_duration=1.0)
    rate = model.cfg.audio_rate
    assert ambi.shape == (int(1.0 * rate), 4)
    # the W channel is the original mono, bit-for-bit from the input windows
    from spatialaudiogen_tpu.data.readers import AudioChunkReader

    reader = AudioChunkReader(os.path.join(root, "synth000", "ambix"), rate, 1)
    expected_w = reader.get(0.5, int(1.0 * rate))[:, 0]
    np.testing.assert_allclose(ambi[:, 0], expected_w.astype(np.float32), atol=1e-6)
    assert np.isfinite(ambi).all()


def test_ondevice_gather_matches_host_windows(trained):
    """The on-device span-gather fast path must be numerically identical to
    per-window host assembly (same windows, same model, same outputs)."""
    root, model_dir = trained
    clip = os.path.join(root, "synth000")
    model = MonoToAmbix(model_dir, batch_size=4, f16_fetch=False)
    mono_d, pred_d = model._predict_span_ondevice(clip, 0.5, 1.5)
    mono_h, pred_h = model._predict_span_host(clip, 0.5, 1.5)
    np.testing.assert_allclose(mono_d, mono_h, atol=1e-6)
    np.testing.assert_allclose(pred_d, pred_h, atol=1e-5)


@pytest.fixture(scope="module")
def trained_video(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("deploydbv"))
    make_synthetic_dataset(root, n_videos=1, duration=4.0, frame_hw=(64, 128), seed=3)
    model_dir = str(tmp_path_factory.mktemp("deploymodelv"))
    cfg = TrainConfig(db_dir=root, model_dir=model_dir,
                      encoders=("audio", "video"), separation="unet_mask",
                      num_sep_tracks=2, frame_hw=(64, 128), n_iters=2,
                      batch_size=2, n_workers=1, log_every=10, ckpt_every=0,
                      n_data=1)
    Trainer(cfg).train()
    return root, model_dir


def test_ondevice_gather_matches_host_windows_video(trained_video):
    """Video frames ride up as uint8 and are normalized on device; outputs
    must match the host img_prep_default path exactly (RGB upload forced —
    the 4:2:0 fast path is covered by its own tolerance test)."""
    root, model_dir = trained_video
    clip = os.path.join(root, "synth000")
    model = MonoToAmbix(model_dir, batch_size=3,  # uneven last batch
                        yuv_frames=False, f16_fetch=False)
    mono_d, pred_d = model._predict_span_ondevice(clip, 0.5, 1.0)
    mono_h, pred_h = model._predict_span_host(clip, 0.5, 1.0)
    np.testing.assert_allclose(mono_d, mono_h, atol=1e-6)
    np.testing.assert_allclose(pred_d, pred_h, atol=1e-5)


def test_yuv420_device_conversion_matches_libjpeg():
    """yuv420_planes_to_rgb01 on the native raw planes reproduces the RGB
    decode (fancy chroma upsample + BT.601) to jpg-rounding tolerance."""
    from PIL import Image

    from spatialaudiogen_tpu.data.readers import VideoFrameReader
    from spatialaudiogen_tpu.deploy.deploy import yuv420_planes_to_rgb01

    import tempfile

    d = tempfile.mkdtemp()
    ys, xs = np.mgrid[0:64, 0:128]
    for i in range(2):
        img = np.stack([128 + 80 * np.sin(2 * np.pi * xs / 128 + i),
                        128 + 80 * np.cos(2 * np.pi * ys / 64),
                        90 + 50 * np.sin(4 * np.pi * xs / 128)], -1)
        Image.fromarray(np.clip(img, 0, 255).astype(np.uint8)).save(
            os.path.join(d, f"{i:06d}.jpg"), quality=92)
    reader = VideoFrameReader(d, rate=10, img_prep=lambda x: x)
    if not reader.yuv420_supported():
        pytest.skip("native 4:2:0 decoder unavailable")
    planes = reader.get_yuv420_by_index(0.0, 2)
    rgb = reader.get_by_index(0.0, 2).astype(np.float32) / 255.0
    rec = np.asarray(yuv420_planes_to_rgb01(planes, 64))
    assert np.abs(rec - rgb).max() < 2.5 / 255.0


def test_host_rgb_to_i420_fallback_close():
    """The emergency host conversion feeds the same device decoder within a
    box-vs-triangle resampling tolerance."""
    from spatialaudiogen_tpu.deploy.deploy import host_rgb_to_i420, yuv420_planes_to_rgb01

    ys, xs = np.mgrid[0:32, 0:64]
    rgb = np.stack([128 + 60 * np.sin(2 * np.pi * xs / 64),
                    128 + 60 * np.cos(2 * np.pi * ys / 32),
                    np.full_like(xs, 80.0)], -1).astype(np.uint8)[None]
    planes = host_rgb_to_i420(rgb)
    rec = np.asarray(yuv420_planes_to_rgb01(planes, 32)) * 255.0
    assert np.abs(rec - rgb.astype(np.float32)).mean() < 3.0


def test_yuv_fast_path_predictions_close(trained_video):
    """The raw-4:2:0 upload path (auto default) tracks the byte-exact RGB
    path: frame inputs differ by jpg rounding only, so predictions agree to
    audio tolerance."""
    from spatialaudiogen_tpu.data.readers import VideoFrameReader

    root, model_dir = trained_video
    clip = os.path.join(root, "synth000")
    if not VideoFrameReader(os.path.join(clip, "video"), rate=10,
                            img_prep=lambda x: x).yuv420_supported():
        pytest.skip("native 4:2:0 decoder unavailable")
    rgb = MonoToAmbix(model_dir, batch_size=3, yuv_frames=False)
    yuv = MonoToAmbix(model_dir, batch_size=3, yuv_frames=True)
    mono_r, pred_r = rgb._predict_span_ondevice(clip, 0.5, 1.0)
    mono_y, pred_y = yuv._predict_span_ondevice(clip, 0.5, 1.0)
    np.testing.assert_allclose(mono_y, mono_r, atol=1e-6)
    scale = np.abs(pred_r).max() + 1e-9
    assert np.abs(pred_y - pred_r).max() / scale < 0.05
    # and the fast path genuinely ships ~half the frame bytes
    assert 0 < yuv.h2d_stats["bytes"] < rgb.h2d_stats["bytes"]


def test_f16_fetch_transport_tolerance(trained):
    """The float16 prediction transport (deploy default) tracks the f32
    fetch within half-precision rounding and records the halved D2H bytes."""
    root, model_dir = trained
    clip = os.path.join(root, "synth000")
    exact = MonoToAmbix(model_dir, batch_size=4, f16_fetch=False)
    fast = MonoToAmbix(model_dir, batch_size=4)  # f16 default
    mono_e, pred_e = exact._predict_span_ondevice(clip, 0.5, 1.0)
    mono_f, pred_f = fast._predict_span_ondevice(clip, 0.5, 1.0)
    np.testing.assert_allclose(mono_f, mono_e, atol=1e-6)
    assert pred_f.dtype == np.float32  # upcast after transport
    scale = np.abs(pred_e).max() + 1e-9
    assert np.abs(pred_f - pred_e).max() / scale < 2e-3
    assert 0 < fast.h2d_stats["d2h_bytes"] == exact.h2d_stats["d2h_bytes"] // 2


def test_deploy_mesh_sharded_matches_single_chip(trained):
    """Window batches shard over the mesh data axis (SURVEY §7: deploy is
    embarrassingly parallel over windows); outputs must equal the
    single-device path, including the batch-stats BatchNorm cross-device
    mean and zero-padded tail lanes."""
    from spatialaudiogen_tpu.parallel.mesh import make_mesh

    root, model_dir = trained
    clip = os.path.join(root, "synth000")
    # f32 transport: this test pins sharding parity at float tolerance, and
    # f16 quantization can round the ~1e-6 all-reduce reorder differences
    # across a half-precision step
    single = MonoToAmbix(model_dir, batch_size=4, f16_fetch=False)
    sharded = MonoToAmbix(model_dir, batch_size=4, f16_fetch=False,
                          mesh=make_mesh(n_data=4, n_model=1))
    a = single.deploy(clip, 0.5, 1.0)
    b = sharded.deploy(clip, 0.5, 1.0)
    np.testing.assert_allclose(a, b, atol=1e-5)
    # the host-assembly path shards too (flow configs use it)
    mono_s, pred_s = sharded._predict_span_host(clip, 0.5, 1.0)
    mono_1, pred_1 = single._predict_span_host(clip, 0.5, 1.0)
    np.testing.assert_allclose(mono_s, mono_1, atol=1e-6)
    np.testing.assert_allclose(pred_s, pred_1, atol=1e-5)


def test_deploy_mesh_sharded_matches_single_chip_video(trained_video):
    """Same with the video encoder + unet_mask head and an uneven tail batch
    (batch 4 over 4 devices, zero-padded lanes land on real devices)."""
    from spatialaudiogen_tpu.parallel.mesh import make_mesh

    root, model_dir = trained_video
    clip = os.path.join(root, "synth000")
    single = MonoToAmbix(model_dir, batch_size=4, f16_fetch=False)
    sharded = MonoToAmbix(model_dir, batch_size=4, f16_fetch=False,
                          mesh=make_mesh(n_data=4, n_model=1))
    a = single.deploy(clip, 0.5, 1.0)
    b = sharded.deploy(clip, 0.5, 1.0)
    np.testing.assert_allclose(a, b, atol=1e-5)


def test_deploy_crossfade_matches_length(trained):
    root, model_dir = trained
    model = MonoToAmbix(model_dir, batch_size=4)
    plain = model.deploy(os.path.join(root, "synth000"), 0.5, 1.0, crossfade=False)
    xfade = model.deploy(os.path.join(root, "synth000"), 0.5, 1.0, crossfade=True)
    assert xfade.shape[0] <= plain.shape[0]
    assert xfade.shape[1] == plain.shape[1]
    assert np.isfinite(xfade).all()


# --- SA3D / mp4 box editing ---

def _fake_mp4():
    stco_payload = struct.pack(">II", 0, 2) + struct.pack(">II", 100, 200)
    mp4a = Box(b"mp4a", children=[Box(b"esds", b"\x00" * 8)],
               header_extra=b"\x00" * 28)
    stsd_a = Box(b"stsd", children=[mp4a], header_extra=struct.pack(">II", 0, 1))
    stbl_a = Box(b"stbl", children=[stsd_a, Box(b"stco", stco_payload)])
    trak_a = Box(b"trak", children=[Box(b"mdia", children=[
        Box(b"minf", children=[Box(b"smhd", b"\x00" * 4), stbl_a])])])

    avc1 = Box(b"avc1", b"\x00" * 70)
    stsd_v = Box(b"stsd", children=[avc1], header_extra=struct.pack(">II", 0, 1))
    trak_v = Box(b"trak", children=[Box(b"mdia", children=[
        Box(b"minf", children=[Box(b"vmhd", b"\x00" * 4),
                               Box(b"stbl", children=[stsd_v])])])])

    moov = Box(b"moov", children=[Box(b"mvhd", b"\x00" * 100), trak_a, trak_v])
    ftyp = Box(b"ftyp", b"isom\x00\x00\x02\x00mp41")
    mdat = Box(b"mdat", b"\x00" * 64)
    return ftyp.serialize() + moov.serialize() + mdat.serialize()


def test_box_roundtrip():
    data = _fake_mp4()
    boxes = parse_top_level(data)
    assert [b.type for b in boxes] == [b"ftyp", b"moov", b"mdat"]
    assert b"".join(b.serialize() for b in boxes) == data


def test_sa3d_injection():
    data = _fake_mp4()
    out = inject_spatial_metadata(data, spatial_audio=True, spherical_video=True)
    boxes = parse_top_level(out)
    moov = boxes[1]
    sa3d = moov.find_all(b"SA3D")
    assert len(sa3d) == 1
    payload = sa3d[0].payload
    version, atype = struct.unpack(">BB", payload[:2])
    order = struct.unpack(">I", payload[2:6])[0]
    ordering, norm = struct.unpack(">BB", payload[6:8])
    nch = struct.unpack(">I", payload[8:12])[0]
    chmap = struct.unpack(f">{nch}I", payload[12:12 + 4 * nch])
    assert (version, atype, order, ordering, norm) == (0, 0, 1, 0, 0)
    assert chmap == (0, 1, 2, 3)
    # spherical uuid on the video trak
    uuids = moov.find_all(b"uuid")
    assert len(uuids) == 1
    assert uuids[0].payload.startswith(SPHERICAL_UUID)
    assert b"equirectangular" in uuids[0].payload
    # idempotent
    again = inject_spatial_metadata(out)
    assert len(parse_top_level(again)[1].find_all(b"SA3D")) == 1


def test_sa3d_shifts_chunk_offsets_when_moov_first():
    data = _fake_mp4()  # moov precedes mdat
    out = inject_spatial_metadata(data)
    moov = parse_top_level(out)[1]
    stco = moov.find_all(b"stco")[0]
    count = struct.unpack(">I", stco.payload[4:8])[0]
    offsets = struct.unpack(f">{count}I", stco.payload[8:8 + 4 * count])
    delta = len(out) - len(data)
    assert delta > 0
    assert offsets == (100 + delta, 200 + delta)


def test_mux_dry_run_commands(tmp_path):
    log = gen_360video("a.wav", "v.mp4", str(tmp_path / "out.mp4"),
                       inject_meta=True, overlay_map=True, dry_run=True)
    joined = "\n".join(log)
    assert joined.count("ffmpeg") == 3  # split audio, split video, mix
    assert "-vn" in joined and "-an" in joined
    assert "inject_spatial_metadata" in joined


def test_binauralize_stereo_is_w_pm_y():
    rng = np.random.RandomState(0)
    amb = rng.randn(100, 4)
    st = binauralize_stereo(amb)
    ratio = (amb[:, 0] + amb[:, 1]) / st[:, 0]
    np.testing.assert_allclose(ratio, ratio[0], rtol=1e-6)
    np.testing.assert_allclose(st[:, 1] * ratio[0], amb[:, 0] - amb[:, 1], rtol=1e-5)


def test_spatialmedia_cli_inject_and_print(tmp_path, capsys):
    """sag-spatialmedia: inject writes SA3D + spherical XML (with stereo
    mode), print mode decodes them back (reference spatialmedia CLI parity,
    3rd-party/spatial-media/spatialmedia/__main__.py)."""
    from spatialaudiogen_tpu.cli.spatialmedia import main as sm_main

    src = tmp_path / "in.mp4"
    dst = tmp_path / "out.mp4"
    src.write_bytes(_fake_mp4())

    sm_main(["-i", "--spatial-audio", "--stereo", "top-bottom",
             str(src), str(dst)])
    out = capsys.readouterr().out
    assert "Injected" in out

    sm_main([str(dst)])
    out = capsys.readouterr().out
    assert "SA3D order=1 ordering=ACN normalization=SN3D" in out
    assert "channel_map=[0, 1, 2, 3]" in out
    assert "spherical V1 XML" in out
    assert "<GSpherical:StereoMode>top-bottom</GSpherical:StereoMode>" in out

    # print mode on a file without metadata reports its absence
    sm_main([str(src)])
    out = capsys.readouterr().out
    assert out.count("no spatial metadata") == 2


def test_describe_file_malformed_inputs(tmp_path):
    """Print mode must degrade gracefully: non-MP4 bytes and truncated SA3D
    payloads report per-file/per-box messages instead of raising."""
    from spatialaudiogen_tpu.deploy.sa3d import describe_file

    notmp4 = tmp_path / "x.wav"
    notmp4.write_bytes(b"RIFF" + b"\x00" * 40)
    (line,) = describe_file(str(notmp4))
    assert "not an MP4" in line

    # inject, then truncate the SA3D payload in place
    good = inject_spatial_metadata(_fake_mp4(), spatial_audio=True,
                                   spherical_video=False)
    idx = good.find(b"SA3D")
    bad = bytearray(good)
    old_size = struct.unpack(">I", bad[idx - 4: idx])[0]
    # shrink the SA3D box: keep header + 4 payload bytes (too short to
    # parse) and splice the remainder after the (now shorter) box
    box_start = idx - 4
    new_size = 12
    rest = bytes(bad[box_start + old_size:])
    truncated = bytes(bad[:box_start]) + struct.pack(">I", new_size) + \
        b"SA3D" + b"\x00" * 4 + rest
    # ancestor sizes are now wrong, so parsing may fail entirely OR decode a
    # malformed box — either way describe_file must not raise
    mp4 = tmp_path / "trunc.mp4"
    mp4.write_bytes(truncated)
    lines = describe_file(str(mp4))
    assert lines  # produced messages, did not raise
