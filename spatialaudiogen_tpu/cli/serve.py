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

Multi-session serving: pass comma-separated input/output lists and the
sessions are multiplexed through ONE StreamBatcher — one batched forward
per 0.1 s tick for all of them. Video models list one frames dir per
input (lanes then share batch statistics exactly like batch deploy —
deploy/stream.py):

    sag-serve MODEL_DIR a.wav,b.wav oa.wav,ob.wav [--frames_dir d1,d2]
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
    parser.add_argument("--flow_dir", default=None,
                        help="10 fps compressed-flow jpg dir incl. "
                             "flow_limits.npy (flow models; single-session "
                             "serving only).")
    parser.add_argument("--realtime", action="store_true",
                        help="Pace pushes at wall-clock rate instead of "
                             "as-fast-as-possible.")
    parser.add_argument("--compute_dtype", default=None,
                        choices=["float32", "bfloat16"])
    parser.add_argument("--n_data", type=int, default=None,
                        help="Shard the batched tick over N chips (mesh "
                             "data axis); multi-session mode only. Session "
                             "count must divide by N.")
    args = parser.parse_args(argv)

    import numpy as np

    from spatialaudiogen_tpu.deploy.stream import StreamingMonoToAmbix
    from spatialaudiogen_tpu.utils.io_audio import load_wav, save_wav
    from spatialaudiogen_tpu.utils.jax_setup import enable_compile_cache

    enable_compile_cache()

    inputs = args.input_wav.split(",")
    outputs = args.output_wav.split(",")
    assert len(inputs) == len(outputs), \
        f"{len(inputs)} inputs vs {len(outputs)} outputs"
    if len(inputs) > 1:
        return _serve_batched(args, inputs, outputs)

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

    flow_reader = None
    if "flow" in stream.cfg.encoders:
        assert args.flow_dir, "flow model: pass --flow_dir"
        import os

        from spatialaudiogen_tpu.data.readers import (FlowFrameReader,
                                                       VideoFrameReader)

        flow_reader = FlowFrameReader(
            args.flow_dir, os.path.join(args.flow_dir, "flow_limits.npy"),
            rate=VideoFrameReader.RAW_RATE)

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
        frame = flow = None
        if frame_reader is not None:
            frame = frame_reader.get_by_index((k // block) / 10.0, 1)[0]
        if flow_reader is not None:
            flow = flow_reader.get_by_index((k // block) / 10.0, 1)[0]
        t0 = time.perf_counter()
        out = stream.push(mono[k: k + block], frame, flow)
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


def _serve_batched(args, inputs: list, outputs: list) -> None:
    """N sessions through one StreamBatcher: one batched forward per tick.
    Sessions whose input ends early are flushed and leave their lane; the
    remaining sessions keep ticking."""
    import time as _time

    import numpy as np

    from spatialaudiogen_tpu.deploy.stream import StreamBatcher
    from spatialaudiogen_tpu.utils.io_audio import load_wav, save_wav

    mesh = None
    if args.n_data and args.n_data > 1:
        from spatialaudiogen_tpu.parallel.mesh import make_mesh

        mesh = make_mesh(n_data=args.n_data, n_model=1)
    batcher = StreamBatcher(args.model_dir, capacity=len(inputs),
                            compute_dtype=args.compute_dtype, mesh=mesh)
    rate = batcher.cfg.audio_rate
    block = batcher.geometry.snd_dur

    # per-session frame readers for video models: --frames_dir lists one
    # 10 fps jpg dir per input, comma-separated like the wav lists. Frames
    # decode lazily, one per pushed block (the single-session rule). NOTE
    # (deploy/stream.py): the batch-statistics BatchNorm quirk couples
    # video lanes exactly like the batch deploy couples windows — batched
    # video serving matches MonoToAmbix batch semantics, not N isolated
    # batch-1 streams.
    frame_readers = None
    if "video" in batcher.cfg.encoders:
        assert args.frames_dir, \
            "video model: pass --frames_dir d1,d2,... (one dir per input)"
        from spatialaudiogen_tpu.data.readers import VideoFrameReader

        dirs = args.frames_dir.split(",")
        assert len(dirs) == len(inputs), \
            f"{len(dirs)} frame dirs vs {len(inputs)} inputs"
        frame_readers = [VideoFrameReader(d, rate=VideoFrameReader.RAW_RATE,
                                          img_prep=lambda x: x)
                         for d in dirs]

    monos = []
    for fn in inputs:
        data, _ = load_wav(fn, rate, dtype=np.float32)
        monos.append(data if data.ndim == 1 else data[:, 0])
    sids = [batcher.add_session() for _ in monos]
    out_chunks = {sid: [] for sid in sids}

    def collect(result):
        for sid, chunks in result.items():
            out_chunks[sid].extend(chunks)

    lat = []
    live = set(sids)
    longest = max(map(len, monos))
    t_start = _time.perf_counter()
    for k in range(0, longest, block):
        if args.realtime:
            # pace at each block's capture END, clamped at end-of-input —
            # same rule (and same reason) as the single-session path above
            target = t_start + min(k + block, longest) / rate
            delay = target - _time.perf_counter()
            if delay > 0:
                _time.sleep(delay)
        for i, sid in enumerate(sids):
            if sid in live and k < len(monos[i]):
                frame = None
                if frame_readers is not None:
                    frame = frame_readers[i].get_by_index(
                        (k // block) / 10.0, 1)[0]
                batcher.push(sid, monos[i][k: k + block], frame)
        t0 = _time.perf_counter()
        res = batcher.tick()
        if any(res.values()):
            # only ticks that ran a forward count toward the latency stats
            # (warm-up / no-ready-window ticks return immediately and would
            # flatter the median and the kept_up verdict — the
            # single-session path's `if out:` rule)
            lat.append(_time.perf_counter() - t0)
        collect(res)
        for i, sid in enumerate(sids):
            if sid in live and k + block >= len(monos[i]):
                collect(batcher.flush(sid))  # end of this session's input
                batcher.remove_session(sid)
                live.discard(sid)
    for sid in list(live):
        collect(batcher.flush(sid))

    wall = _time.perf_counter() - t_start
    total_served = 0.0
    for i, (sid, out_fn) in enumerate(zip(sids, outputs)):
        assert out_chunks[sid], f"input {inputs[i]} shorter than one window"
        foa = np.concatenate(out_chunks[sid], axis=0)
        save_wav(out_fn, foa, rate)
        total_served += foa.shape[0] / rate
        print(f"wrote {out_fn} ({foa.shape[0]} frames x {foa.shape[1]} ch)")
    lat_ms = np.array(lat) * 1e3
    print(f"served {len(inputs)} sessions, {total_served:.1f} s of FOA total "
          f"in {wall:.1f} s ({total_served / wall:.1f}x realtime aggregate); "
          f"per-tick latency median {np.median(lat_ms):.1f} ms / p90 "
          f"{np.percentile(lat_ms, 90):.1f} ms"
          + ("" if not args.realtime else
             f"; kept_up={bool(np.percentile(lat_ms, 90) < 100.0)}"))


if __name__ == "__main__":
    main()
