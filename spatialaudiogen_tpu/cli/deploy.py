"""Deploy CLI — flag parity with reference deploy.py:14-38.

    python -m spatialaudiogen_tpu.cli.deploy MODEL_DIR INPUT_FOLDER VIDEO \
        [--deploy_start 0] [--deploy_duration 10] [--output_fn out] \
        [--save_ambix] [--save_video] [--overlay_map] [--VR] [--crossfade]
"""

from __future__ import annotations

import argparse
import os
import subprocess
import tempfile


def parse_arguments(argv=None):
    parser = argparse.ArgumentParser(
        description=__doc__, formatter_class=argparse.RawDescriptionHelpFormatter)
    parser.add_argument("model_dir", help="Directory containing model snapshot.")
    parser.add_argument("input_folder", help="Folder with input sample (frames layout).")
    parser.add_argument("video", nargs="?", default="", help="High resolution video.")
    parser.add_argument("--deploy_start", default=0.0, type=float)
    parser.add_argument("--deploy_duration", default=10.0, type=float)
    parser.add_argument("--output_fn", default="output")
    parser.add_argument("--save_ambix", action="store_true")
    parser.add_argument("--save_video", action="store_true")
    parser.add_argument("--overlay_map", action="store_true")
    parser.add_argument("--VR", action="store_true", help="360 video output.")
    parser.add_argument("--batch_size", default=32, type=int)
    parser.add_argument("--n_data", default=1, type=int,
                        help="Shard each window batch over this many devices "
                             "(data axis of a ('data','model') mesh).")
    parser.add_argument("--compute_dtype", default=None,
                        choices=["float32", "bfloat16"],
                        help="Override the training compute dtype (bf16 "
                             "fast deploy of an f32 model, or f32-exact "
                             "deploy of a bf16 one).")
    parser.add_argument("--crossfade", action="store_true",
                        help="Hann-blend half-offset passes at window seams.")
    parser.add_argument("--rgb_frames", action="store_true",
                        help="Force byte-exact RGB frame upload instead of "
                             "the raw-4:2:0-planes fast path (half the H2D "
                             "bytes, ~1.4/255 frame tolerance).")
    parser.add_argument("--f32_fetch", action="store_true",
                        help="Fetch predictions as float32 instead of the "
                             "float16 transport default (half the D2H "
                             "bytes, ~-76 dBFS transport error).")
    args = parser.parse_args(argv)
    if args.deploy_duration <= 0:
        args.deploy_duration = None
    return args


def main(argv=None):
    args = parse_arguments(argv)
    from spatialaudiogen_tpu.deploy.deploy import MonoToAmbix
    from spatialaudiogen_tpu.utils.io_audio import save_wav
    from spatialaudiogen_tpu.utils.jax_setup import enable_compile_cache

    enable_compile_cache()

    mesh = None
    if args.n_data > 1:
        from spatialaudiogen_tpu.parallel.mesh import make_mesh

        mesh = make_mesh(n_data=args.n_data, n_model=1)
    model = MonoToAmbix(args.model_dir, batch_size=args.batch_size, mesh=mesh,
                        compute_dtype=args.compute_dtype,
                        yuv_frames=False if args.rgb_frames else None,
                        f16_fetch=not args.f32_fetch)
    print(f"Restored checkpoint step {model.restored_step}")
    print("Generating ambisonics...")
    ambi = model.deploy(args.input_folder, args.deploy_start, args.deploy_duration,
                        crossfade=args.crossfade)

    tmp_ambix = tempfile.mktemp(prefix="sag_", suffix=".wav")
    save_wav(tmp_ambix, ambi, model.cfg.audio_rate)
    print(f"Predicted {ambi.shape[0] / model.cfg.audio_rate:.1f}s of "
          f"{ambi.shape[1]}-channel ambisonics")

    if args.save_ambix:
        out = args.output_fn if args.output_fn.endswith(".wav") else args.output_fn + ".wav"
        subprocess.run(["cp", tmp_ambix, out], check=True)
        print(f"Saved ambisonics wav: {out}")

    if args.save_video:
        assert args.video, "--save_video requires the VIDEO argument"
        from spatialaudiogen_tpu.deploy.mux import gen_360video

        tmp_video = tempfile.mktemp(prefix="sag_", suffix=".mp4")
        subprocess.run(["ffmpeg", "-y", "-ss", str(args.deploy_start), "-i", args.video,
                        "-t", str(args.deploy_duration), tmp_video], check=True)
        gen_360video(tmp_ambix, tmp_video, args.output_fn,
                     overlay_map=args.overlay_map, inject_meta=args.VR,
                     binauralize=not args.VR, ambi_order=model.cfg.ambi_order)
        os.remove(tmp_video)
    os.remove(tmp_ambix)


if __name__ == "__main__":
    main()
