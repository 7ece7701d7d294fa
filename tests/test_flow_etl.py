"""Flow ingestion tests (Farneback default + compressed layout)."""

import numpy as np

from spatialaudiogen_tpu.etl.flow import farneback_flow, flow_for_frames


def _moving_blob_frames(t=5, h=48, w=64, step=3):
    ys, xs = np.mgrid[0:h, 0:w]
    frames = np.zeros((t, h, w, 3), np.uint8)
    for i in range(t):
        cx = 16 + step * i
        blob = np.exp(-(((xs - cx) ** 2 + (ys - 24) ** 2) / 40.0))
        frames[i, :, :, 0] = (blob * 255).astype(np.uint8)
        frames[i, :, :, 1] = frames[i, :, :, 0]
        frames[i, :, :, 2] = frames[i, :, :, 0]
    return frames


def test_farneback_detects_motion_direction():
    frames = _moving_blob_frames()
    flow = farneback_flow(frames)
    assert flow.shape == (5, 48, 64, 2)
    # the blob moves +x: flow x-component near the blob should be positive
    region = flow[1, 18:30, 14:30, 0]
    assert region.mean() > 0.5, region.mean()


def test_flow_for_frames_writes_feeder_layout(tmp_path):
    from PIL import Image

    frames_dir = tmp_path / "video"
    frames_dir.mkdir()
    frames = _moving_blob_frames()
    for i in range(frames.shape[0]):
        Image.fromarray(frames[i]).save(frames_dir / f"{i:06d}.jpg")
    flow_dir = str(tmp_path / "flow")
    flow = flow_for_frames(str(frames_dir), flow_dir)
    assert flow.shape[0] == 5
    import os

    assert os.path.exists(flow_dir + "/flow_limits.npy")
    assert len([f for f in os.listdir(flow_dir) if f.endswith(".jpg")]) == 5

    from spatialaudiogen_tpu.data.readers import FlowFrameReader

    reader = FlowFrameReader(flow_dir, flow_dir + "/flow_limits.npy", rate=10)
    chunk = reader.get_by_index(0, 2)
    assert chunk.shape == (2, 48, 64, 3)
    assert np.isfinite(chunk).all()


def test_flow_cli_over_db_list(tmp_path, capsys):
    """sag-flow computes flow for each listed video and skips idempotently."""
    from PIL import Image

    from spatialaudiogen_tpu.cli.flow import main

    frames = _moving_blob_frames()
    for yid in ("vidA", "vidB"):
        video_dir = tmp_path / "frames" / yid / "video"
        video_dir.mkdir(parents=True)
        for i in range(frames.shape[0]):
            Image.fromarray(frames[i]).save(video_dir / f"{i:06d}.jpg")
    db = tmp_path / "db.lst"
    db.write_text("vidA\nvidB\nvidMissing\n")

    main([str(db), "--frames_dir", str(tmp_path / "frames")])
    assert "2 computed, 1 skipped" in capsys.readouterr().out
    for yid in ("vidA", "vidB"):
        assert (tmp_path / "frames" / yid / "flow" / "flow_limits.npy").exists()

    main([str(db), "--frames_dir", str(tmp_path / "frames")])
    assert "0 computed, 3 skipped" in capsys.readouterr().out
