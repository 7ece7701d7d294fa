"""Dataset acquisition: yt-dlp command construction + archive resume.

Parity with reference scraping/download.py: per-video pinned audio/video
format ids come from format tables (scraping/{audio,video}_formats(.lowres)
.txt layout: "<youtube_id> <format_id>" lines), downloads resume via a
download-archive file, errors are skipped. yt-dlp replaces youtube-dl.

All functions build command lists; `download_all(..., dry_run=True)` returns
them without executing (this environment has no network egress).
"""

from __future__ import annotations

import os

from spatialaudiogen_tpu.utils.cmd import run_system_cmd


def load_format_table(fn: str) -> dict:
    table = {}
    for line in open(fn):
        parts = line.split()
        if len(parts) >= 2:
            table[parts[0]] = parts[1]
    return table


def build_download_cmd(youtube_id: str, output_dir: str, fmt: str | None,
                       archive_fn: str, kind: str) -> list:
    url = f"https://youtu.be/{youtube_id}"
    out_tmpl = os.path.join(output_dir, f"{youtube_id}.%(ext)s")
    cmd = ["yt-dlp", "--ignore-errors", "--download-archive", archive_fn,
           "-o", out_tmpl]
    if fmt is not None:
        cmd += ["-f", fmt]
    elif kind == "audio":
        cmd += ["-f", "bestaudio"]
    else:
        cmd += ["-f", "bestvideo"]
    cmd.append(url)
    return cmd


def download_all(db_lst_fn: str, output_dir: str,
                 audio_formats_fn: str | None = None,
                 video_formats_fn: str | None = None,
                 dry_run: bool = False) -> list:
    """Download audio+video streams for every id in a db list file."""
    os.makedirs(output_dir, exist_ok=True)
    ids = [line.strip().split()[0] for line in open(db_lst_fn) if line.strip()]
    audio_fmt = load_format_table(audio_formats_fn) if audio_formats_fn else {}
    video_fmt = load_format_table(video_formats_fn) if video_formats_fn else {}
    archive = os.path.join(output_dir, "downloaded.txt")
    commands = []
    for yid in ids:
        for kind, table in (("audio", audio_fmt), ("video", video_fmt)):
            cmd = build_download_cmd(yid, output_dir, table.get(yid), archive, kind)
            commands.append(cmd)
            if not dry_run:
                run_system_cmd(cmd, check=False)
    return commands
