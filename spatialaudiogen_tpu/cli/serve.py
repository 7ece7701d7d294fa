"""Streaming mono->FOA serving over a wav (the file-fed face of the live
serving mode, deploy/stream.py).

Reads INPUT_WAV's first channel in 0.1 s blocks (plus 10 fps frames from
--frames_dir for video models), pushes them through StreamingMonoToAmbix,
and writes the FOA output wav. `--realtime` paces the pushes at wall-clock
rate and reports whether serving kept up; without it the stream is pushed
as fast as the chip drains it. Per-window serve latency stats print either
way.

    sag-serve MODEL_DIR input.wav output.wav [--frames_dir D] [--realtime]

Outputs are bit-identical to `sag-deploy --batch_size 1` over the same
samples (tests/test_stream.py pins the engine-level equality).
"""

from __future__ import annotations

import argparse
import time


def main(argv=None) -> None:
    parser = argparse.ArgumentParser(
        description=__doc__, formatter_class=argparse.RawDescriptionHelpFormatter)
    parser.add_argument("model_dir")
    parser.add_argument("input_wav", help="Mono (or first-channel) source.")
    parser.add_argument("output_wav")
    parser.add_argument("--frames_dir", default=None,
                        help="10 fps jpg frames dir (video models).")
    parser.add_argument("--realtime", action="store_true",
                        help="Pace pushes at wall-clock rate instead of "
                             "as-fast-as-possible.")
    parser.add_argument("--compute_dtype", default=None,
                        choices=["float32", "bfloat16"])
    args = parser.parse_args(argv)

    import numpy as np

    from spatialaudiogen_tpu.deploy.stream import StreamingMonoToAmbix
    from spatialaudiogen_tpu.utils.io_audio import load_wav, save_wav
    from spatialaudiogen_tpu.utils.jax_setup import enable_compile_cache

    enable_compile_cache()
    stream = StreamingMonoToAmbix(args.model_dir,
                                  compute_dtype=args.compute_dtype)
    rate = stream.cfg.audio_rate
    block = stream.geometry.snd_dur  # one 0.1 s push per frame period

    data, in_rate = load_wav(args.input_wav, rate, dtype=np.float32)
    mono = data if data.ndim == 1 else data[:, 0]

    frame_reader = None
    if "video" in stream.cfg.encoders:
        assert args.frames_dir, "video model: pass --frames_dir"
        from spatialaudiogen_tpu.data.readers import VideoFrameReader

        # decoded lazily, one frame per pushed block: a long input must not
        # sit fully decoded in RAM (an hour of 224x448 would be ~11 GB)
        frame_reader = VideoFrameReader(args.frames_dir,
                                        rate=VideoFrameReader.RAW_RATE,
                                        img_prep=lambda x: x)

    chunks, lat = [], []
    t_start = time.perf_counter()
    for k in range(0, len(mono), block):
        if args.realtime:
            # a live source finishes capturing block k at (k+block)/rate —
            # pacing at the block's START time would hand the model its
            # last 0.1 s early and flatter the kept_up verdict
            target = t_start + min(k + block, len(mono)) / rate
            delay = target - time.perf_counter()
            if delay > 0:
                time.sleep(delay)
        frame = None
        if frame_reader is not None:
            frame = frame_reader.get_by_index((k // block) / 10.0, 1)[0]
        t0 = time.perf_counter()
        out = stream.push(mono[k: k + block], frame)
        if out:
            lat.append(time.perf_counter() - t0)
            chunks.extend(out)
    # end of stream: emit the windows still waiting on future context
    # (zero-padded exactly like batch deploy past clip end)
    chunks.extend(stream.flush())

    assert chunks, "input shorter than one serving window (need > 0.6 s)"
    foa = np.concatenate(chunks, axis=0)
    save_wav(args.output_wav, foa, rate)
    lat_ms = np.array(lat) * 1e3
    served = foa.shape[0] / rate
    wall = time.perf_counter() - t_start
    print(f"served {served:.1f} s of FOA in {wall:.1f} s "
          f"({served / wall:.1f}x realtime); per-window serve latency "
          f"median {np.median(lat_ms):.1f} ms / p90 "
          f"{np.percentile(lat_ms, 90):.1f} ms"
          + ("" if not args.realtime else
             f"; kept_up={bool(np.percentile(lat_ms, 90) < 100.0)}"))
    print(f"wrote {args.output_wav} ({foa.shape[0]} frames x "
          f"{foa.shape[1]} ch @ {rate} Hz)")


if __name__ == "__main__":
    main()
