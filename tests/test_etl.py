"""ETL tests: projection geometry roundtrips and command construction."""

import numpy as np
import pytest

from spatialaudiogen_tpu.etl.download import build_download_cmd, download_all
from spatialaudiogen_tpu.etl.preprocess import (
    ambisonics_cmd,
    compress_flow,
    compute_audio_pow,
    extract_frames,
    video_cmds,
)
from spatialaudiogen_tpu.etl.projections import (
    FACES,
    equirect_rays,
    equirect_to_eac,
    face_uv_to_ray,
    gen_eac2eqr_maps,
    ray_to_face_uv,
    remap,
)


def test_face_uv_ray_roundtrip():
    rng = np.random.RandomState(0)
    for name_idx, face in enumerate(FACES):
        u = rng.uniform(0.05, 0.95, 200)
        v = rng.uniform(0.05, 0.95, 200)
        rays = face_uv_to_ray(face, u, v)
        fi, u2, v2 = ray_to_face_uv(rays)
        assert np.all(fi == name_idx), face
        np.testing.assert_allclose(u2, u, atol=1e-9)
        np.testing.assert_allclose(v2, v, atol=1e-9)


def test_equirect_rays_cardinal_directions():
    rays = equirect_rays(180, 360)
    # center pixel: theta ~ 0, phi ~ 0 -> +x (front)
    np.testing.assert_allclose(rays[90, 180], [1, 0, 0], atol=0.03)
    # top row: phi = -pi/2 -> -z
    assert rays[0, 180][2] < -0.99


def _smooth_pattern(h, w):
    y, x = np.mgrid[0:h, 0:w]
    img = np.stack([
        128 + 100 * np.sin(2 * np.pi * x / w),
        128 + 100 * np.cos(2 * np.pi * y / h),
        128 + 60 * np.sin(4 * np.pi * x / w) * np.cos(2 * np.pi * y / h),
    ], axis=-1)
    return img.astype(np.float64)


@pytest.mark.parametrize("stereopsis", ["MONO", "STEREO"])
def test_eac_roundtrip(stereopsis):
    """equirect -> EAC -> (maps) -> equirect must reproduce the image."""
    eqr = _smooth_pattern(90, 180)
    eac_shape = (120, 180) if stereopsis == "MONO" else (180, 240)
    eac = equirect_to_eac(eqr, eac_shape, stereopsis)
    xmap, ymap = gen_eac2eqr_maps(eac_shape, (90, 180), stereopsis)
    back = remap(eac, xmap, ymap)
    # skip the poles (top/bottom 15%) where angular resolution is lowest
    sl = slice(14, 76)
    err = np.abs(back[sl] - eqr[sl])
    assert err.mean() < 6.0, err.mean()
    assert np.median(err) < 3.0


def test_ambisonics_remap_cmds():
    cmd = ambisonics_cmd("in.m4a", "out.wav", "aac")
    assert "pan=4c|c0=c2|c1=c1|c2=c4|c3=c0" in " ".join(cmd)
    cmd = ambisonics_cmd("in.webm", "out.wav", "opus")
    assert "pan=4c|c0=c0|c1=c1|c2=c2|c3=c3" in " ".join(cmd)
    with pytest.raises(ValueError):
        ambisonics_cmd("in.xxx", "out.wav", "mp3")


def test_video_cmds(tmp_path):
    er = video_cmds("in.mp4", "STEREO", "ER", "out.mp4", (224, 448), 10)
    assert len(er) == 1 and "crop=in_w:in_h/2:0:0,scale=448:224" in " ".join(er[0])
    eac = video_cmds("in.mp4", "MONO", "EAC", str(tmp_path / "out.mp4"),
                     (56, 112), 10, in_shape=(120, 180), pgm_dir=str(tmp_path))
    assert len(eac) == 2
    assert "remap" in " ".join(eac[0])
    assert (tmp_path / "xmap_120x180_112x224_MONO.pgm").exists()
    header = open(tmp_path / "xmap_120x180_112x224_MONO.pgm").readline()
    assert header.strip() == "P2"


def test_download_cmds(tmp_path):
    db = tmp_path / "db.lst"
    db.write_text("abc123\nxyz789\n")
    fmts = tmp_path / "audio_formats.txt"
    fmts.write_text("abc123 251\n")
    cmds = download_all(str(db), str(tmp_path), audio_formats_fn=str(fmts),
                        dry_run=True)
    assert len(cmds) == 4  # audio+video per id
    joined = [" ".join(c) for c in cmds]
    assert any("-f 251" in c and "abc123" in c for c in joined)
    assert all("--download-archive" in c for c in joined)
    assert any("-f bestaudio" in c and "xyz789" in c for c in joined)


def test_download_pinned_formats_full_db(tmp_path):
    """Every command emitted over the real db list carries a pinned -f id
    from the vendored meta/formats tables (scraping/download.py:58-67)."""
    import os

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    db = os.path.join(repo, "meta", "spatialaudiogen_db.lst")
    cmds = download_all(db, str(tmp_path), dry_run=True)
    assert cmds and len(cmds) % 2 == 0
    n_videos = len(cmds) // 2
    # the tables cover nearly the whole 1189-video db (reference skips the rest)
    assert n_videos >= 1100, n_videos
    for cmd in cmds:
        fmt = cmd[cmd.index("-f") + 1]
        assert fmt not in ("bestaudio", "bestvideo"), cmd
        assert fmt.split("+")[0].split("-")[0].isdigit(), cmd
    # audio/video use distinct resume archives + reference filename templates
    joined = [" ".join(c) for c in cmds]
    assert any("downloaded_audio.txt" in c and ".audio.f%(format_id)s." in c
               for c in joined)
    assert any("downloaded_video.txt" in c and ".video." in c for c in joined)

    # low_res swaps the video table
    lo = download_all(db, str(tmp_path), low_res=True, dry_run=True)
    hi_video = {c[-1]: c[c.index("-f") + 1] for c in cmds if ".video." in " ".join(c)}
    lo_video = {c[-1]: c[c.index("-f") + 1] for c in lo if ".video." in " ".join(c)}
    common = set(hi_video) & set(lo_video)
    assert common and any(hi_video[u] != lo_video[u] for u in common)


def test_flow_frame_rgb_matches_reference_formulas():
    """Golden: the per-frame encoding is byte-identical to the reference's
    (scraping/preprocess.py:185-199) — atan2+pi angles, sub-0.005-magnitude
    angle zeroing, m_max clamped to m_min+1, truncating uint8 casts."""
    from spatialaudiogen_tpu.etl.preprocess import flow_frame_rgb

    rng = np.random.RandomState(7)
    flow = rng.randn(16, 24, 2).astype(np.float32) * 3
    flow[0, :4] = 1e-4  # below the 0.005 angle-zeroing threshold
    rgb, (m_min, m_max) = flow_frame_rgb(flow)

    # reference formulas, verbatim
    mag = np.sqrt((flow ** 2).sum(axis=2))
    ang = np.arctan2(flow[:, :, 1], flow[:, :, 0]) + np.pi
    ang[mag < 0.005] = 0
    r_min, r_max = mag.min(), mag.max()
    if r_max - r_min < 1:
        r_max = r_min + 1
    ref = np.zeros(flow.shape[:2] + (3,), dtype=np.uint8)
    ref[..., 0] = (ang * 255.0 / (np.pi * 2.0))
    ref[..., 2] = (mag - r_min) / (r_max - r_min) * 255.0
    np.testing.assert_array_equal(rgb, ref)
    assert (m_min, m_max) == (r_min, r_max)

    # the range clamp: near-constant magnitudes store (min, min + 1)
    tiny = np.full((8, 8, 2), 0.1, np.float32)
    _, (t_min, t_max) = flow_frame_rgb(tiny)
    assert abs(t_max - (t_min + 1)) < 1e-6


def test_flow_compress_decompress_roundtrip(tmp_path):
    # smooth fields (real optical flow is smooth; jpg would destroy noise)
    y, x = np.mgrid[0:32, 0:64]
    base = np.stack([2 * np.sin(2 * np.pi * x / 64) + 0.5,
                     1.5 * np.cos(2 * np.pi * y / 32) - 0.3], axis=-1)
    flow = np.stack([base * (1 + 0.2 * k) for k in range(3)]).astype(np.float32)
    flow_dir = str(tmp_path / "flow")
    compress_flow(flow, flow_dir)

    from spatialaudiogen_tpu.data.readers import FlowFrameReader

    reader = FlowFrameReader(flow_dir, flow_dir + "/flow_limits.npy", rate=10)
    got = reader.get_by_index(0, 3)
    # channel 2 is magnitude; 0/1 are x/y components. The atan2+pi store +
    # the decoder's 0..2pi read yield PI-ROTATED vectors — exactly how the
    # reference encode/decode pair behaves (preprocess.py:186 vs
    # feeder.py:158-160), which is what flow checkpoints were trained on.
    mag = np.sqrt(flow[..., 0] ** 2 + flow[..., 1] ** 2)
    assert got.shape == (3, 32, 64, 3)
    assert np.abs(got[..., 2] - mag).mean() < 0.25
    assert np.abs(got[..., 0] - (-flow[..., 0])).mean() < 0.6
    assert np.abs(got[..., 1] - (-flow[..., 1])).mean() < 0.6


def test_extract_frames_and_audio_pow(tmp_path):
    from spatialaudiogen_tpu.utils.io_audio import save_wav

    rng = np.random.RandomState(2)
    wav_fn = str(tmp_path / "prep.wav")
    save_wav(wav_fn, rng.randn(3 * 8000, 4) * 0.3, 8000)
    frames_dir = str(tmp_path / "frames")
    n = extract_frames(wav_fn, None, frames_dir, rate=8000)
    assert n == 3
    import os

    assert sorted(os.listdir(frames_dir + "/ambix")) == [
        "000000.wav", "000001.wav", "000002.wav"]
    out = compute_audio_pow(frames_dir, rate=8000)
    lines = open(out).read().splitlines()
    assert len(lines) == 20  # (3-1)*10 windows
    t0, p0 = map(float, lines[0].split())
    assert t0 == 0.5 and p0 > 0.2


def test_extract_frames_av_duration_sync(tmp_path):
    """Both streams truncate to int(min(audio, video)) seconds
    (reference preprocess.py:123-124): 5 s of audio + 2 s of video must
    yield 2 wav chunks and 20 jpgs, not 5 wavs outrunning the frames."""
    import os

    from spatialaudiogen_tpu.utils.io_audio import save_wav
    from spatialaudiogen_tpu.utils.io_video import VideoWriter

    rng = np.random.RandomState(4)
    wav_fn = str(tmp_path / "prep.wav")
    save_wav(wav_fn, rng.randn(5 * 8000, 4) * 0.3, 8000)
    video_fn = str(tmp_path / "prep.mp4")
    writer = VideoWriter(video_fn, fps=10)
    for i in range(20):  # 2 s @ 10 fps
        writer.write_frame(np.full((32, 64, 3), i * 10, np.uint8))
    writer.close()

    frames_dir = str(tmp_path / "frames")
    n = extract_frames(wav_fn, video_fn, frames_dir, rate=8000, video_rate=10)
    assert n == 2
    assert len(os.listdir(frames_dir + "/ambix")) == 2
    # cv2 sometimes decodes one frame fewer than CAP_PROP_FRAME_COUNT
    # reports; the sync property is that frames stop at 2 s worth
    assert 19 <= len(os.listdir(frames_dir + "/video")) <= 20


def test_preprocess_worker_hr_video_dry_run(tmp_path, capsys):
    """--prep_hr_video emits a second 1080x1920@30 ffmpeg render into the HR
    dir (reference preprocess.py:250-256)."""
    from spatialaudiogen_tpu.etl.preprocess import preprocess_video_worker

    job = {
        "audio_fn": "a.webm", "prep_audio_fn": str(tmp_path / "p-ambix.m4a"),
        "codec": "opus", "frames_dir": str(tmp_path / "frames"),
        "video_fn": "v.mp4", "prep_video_fn": str(tmp_path / "p-video.mp4"),
        "prep_hr_video_fn": str(tmp_path / "hr" / "p-video.mp4"),
        "stereopsis": "MONO", "projection": "ER", "dry_run": True,
    }
    preprocess_video_worker(job)
    out = capsys.readouterr().out
    assert "scale=448:224" in out and "-r 10" in out      # training render
    assert "scale=1920:1080" in out and "-r 30" in out    # HR deploy render
    assert str(tmp_path / "hr") in out


def test_preprocess_pool_includes_flow(tmp_path):
    """One worker invocation yields the complete frames layout including
    flow/ when job['flow'] is set (reference runs flow inside the worker,
    preprocess.py:264)."""
    import os

    from spatialaudiogen_tpu.etl.preprocess import preprocess_all
    from spatialaudiogen_tpu.utils.io_audio import save_wav
    from spatialaudiogen_tpu.utils.io_video import VideoWriter

    # pre-create the prepared streams so the ffmpeg stages skip-if-exists
    # (no ffmpeg binary in the test environment)
    rng = np.random.RandomState(5)
    prep_audio = str(tmp_path / "vid-ambix.m4a")  # own RIFF codec reads any ext
    save_wav(prep_audio, rng.randn(2 * 48000, 4) * 0.3, 48000)
    prep_video = str(tmp_path / "vid-video.mp4")
    writer = VideoWriter(prep_video, fps=10)
    ys, xs = np.mgrid[0:48, 0:64]
    for i in range(20):
        blob = np.exp(-(((xs - 16 - 2 * i) ** 2 + (ys - 24) ** 2) / 40.0))
        writer.write_frame(np.repeat((blob * 255).astype(np.uint8)[..., None], 3, -1))
    writer.close()

    frames_dir = str(tmp_path / "frames" / "vid")
    job = {"audio_fn": prep_audio, "prep_audio_fn": prep_audio, "codec": "opus",
           "video_fn": prep_video, "prep_video_fn": prep_video,
           "frames_dir": frames_dir, "flow": "farneback"}
    assert preprocess_all([job], n_workers=1) == [frames_dir]
    assert len(os.listdir(os.path.join(frames_dir, "ambix"))) == 2
    n_jpg = len(os.listdir(os.path.join(frames_dir, "video")))
    assert 19 <= n_jpg <= 20  # cv2 may decode one frame short of its count
    assert os.path.exists(os.path.join(frames_dir, "audio_pow.lst"))
    flow_jpgs = [f for f in os.listdir(os.path.join(frames_dir, "flow"))
                 if f.endswith(".jpg")]
    assert len(flow_jpgs) == n_jpg
    assert os.path.exists(os.path.join(frames_dir, "flow", "flow_limits.npy"))


def test_build_jobs_from_downloads(tmp_path):
    """Job construction mirrors reference preprocess.py:268-273: streams
    matched by filename id, codec/stereopsis/projection from meta/formats."""
    import os

    from spatialaudiogen_tpu.etl.preprocess import build_jobs

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    # two real ids from the vendored tables + one unknown
    ids = ["-076WPWoCRE", "03UPyfDYf4g", "zzz_unknown"]
    orig = tmp_path / "orig"
    orig.mkdir()
    for yid in ids:
        (orig / f"{yid}.audio.f338.webm").write_bytes(b"x")
        (orig / f"{yid}.video.mp4").write_bytes(b"x")
    db = tmp_path / "db.lst"
    db.write_text("\n".join(ids) + "\n")
    jobs = build_jobs(str(db), str(orig), str(tmp_path / "prep"),
                      str(tmp_path / "frames"), dry_run=True)
    by_id = {os.path.basename(j["frames_dir"]): j for j in jobs}
    assert set(by_id) == {"-076WPWoCRE", "03UPyfDYf4g"}  # unknown id skipped
    j = by_id["-076WPWoCRE"]
    assert j["codec"] == "opus"
    assert j["prep_audio_fn"].endswith("-076WPWoCRE-ambix.m4a")
    jv = by_id["03UPyfDYf4g"]
    assert (jv["stereopsis"], jv["projection"]) == ("MONO", "EAC")

    # the dry-run worker path builds commands without ffmpeg present
    from spatialaudiogen_tpu.etl.preprocess import preprocess_all

    assert preprocess_all(jobs, n_workers=1) == [j["frames_dir"] for j in jobs]


def test_preprocess_pool_rejects_tpu_flow(tmp_path):
    """flow='tpu' must not enter the worker pool: forked workers would each
    initialize the (process-exclusive) TPU backend. main() runs TPU flow as
    a serial post-pass instead; the pool guard is the backstop for direct
    API users."""
    import pytest

    from spatialaudiogen_tpu.etl.preprocess import preprocess_all

    job = {"audio_fn": "x", "prep_audio_fn": "x", "codec": "opus",
           "frames_dir": str(tmp_path / "f"), "flow": "tpu"}
    with pytest.raises(AssertionError, match="worker pool"):
        preprocess_all([job, job], n_workers=2)
