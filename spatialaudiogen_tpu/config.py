"""Training configuration: CLI-flag parity + persistence/resume.

The reference persists hyperparameters to model_dir/train-params.txt and
reconstructs eval/deploy models solely from it (myutils.py:29-85, train.py
:69-79, eval.py:36, deploy.py:44). Here the canonical artifact is
train-params.json; a train-params.txt in the reference's "key: value" format
is written alongside (and can be parsed) so both tool families interoperate.
"""

from __future__ import annotations

import dataclasses
import json
import os
from typing import Any

from spatialaudiogen_tpu.models.sptaudiogen import FREQ_MASK, SptAudioGenConfig


@dataclasses.dataclass
class TrainConfig:
    db_dir: str = ""
    model_dir: str = ""
    subset_fn: str | None = None
    encoders: tuple = ("audio", "video", "flow")
    separation: str = FREQ_MASK
    ambi_order: int = 1
    audio_rate: int = 48000
    video_rate: int = 10
    context: float = 1.0
    sample_dur: float = 0.1
    n_iters: int = 1000000
    lr: float = 1e-4
    lr_decay: float = 0.5
    lr_iters: int = 250000
    batch_size: int = 32
    num_sep_tracks: int = 32
    fft_window: float = 0.025
    context_units: tuple = (64, 128, 128)
    freq_mask_units: tuple = (256,)
    loc_units: tuple = (512, 512)
    resume: bool = False
    # framework extensions (not in the reference CLI)
    n_workers: int = 8
    log_every: int = 20
    ckpt_every: int = 5000
    tb_histograms: int = 0        # parameter+gradient-histogram TB summaries
                                  # every N steps (0 = off; dnn.py:692-709)
    tb_activations: bool = False  # also histogram the model's tapped
                                  # activations (ends dict) on those steps —
                                  # a large per-write fetch, so double opt-in
    seed: int = 0
    frame_hw: tuple = (224, 448)
    n_data: int | None = None     # mesh data-parallel size (None = all devices)
    n_model: int = 1              # mesh tensor-parallel size
    weight_decay: float = 5e-4
    clip_norm: float | None = None
    dft_precision: str = "highest"
    # "bfloat16" runs the conv/FC stacks in bf16 on the MXU with f32 master
    # weights; the DFTs, mask, decode, loss, and Adam stay f32 (fast mode,
    # PERF.md). "float32" is the parity default.
    compute_dtype: str = "float32"
    # Pallas masked-iDFT matmul precision ("default" = 53 dB SNR vs exact,
    # ~1.4x faster forward; "highest" = ~1e-7; models.sptaudiogen).
    pallas_precision: str = "default"
    # ImageNet-pretrained ResNet18 weights (a reference-style resnet18.npy
    # flat TF var-name dict) applied to each visual encoder at train start
    # — the reference's restore_pretrained init (model.py:198,
    # resnet.py:238-249).
    pretrained_resnet: str | None = None

    def model_config(self) -> SptAudioGenConfig:
        num_sep = self.num_sep_tracks if self.separation == FREQ_MASK else 1
        assert self.compute_dtype in ("float32", "bfloat16"), self.compute_dtype
        dtype = None
        if self.compute_dtype == "bfloat16":
            import jax.numpy as jnp

            dtype = jnp.bfloat16
        return SptAudioGenConfig(
            dtype=dtype,
            pallas_precision=self.pallas_precision,
            ambi_order=self.ambi_order,
            audio_rate=self.audio_rate,
            video_rate=self.video_rate,
            context=self.context,
            sample_duration=self.sample_dur,
            encoders=tuple(self.encoders),
            separation=self.separation,
            sep_num_tracks=num_sep,
            loc_fc_units=tuple(self.loc_units),
            ctx_feats_fc_units=tuple(self.context_units),
            sep_freq_mask_fc_units=tuple(self.freq_mask_units),
            sep_fft_window=self.fft_window,
            dft_precision=self.dft_precision,
        )

    # --- persistence ---
    def save(self, model_dir: str | None = None):
        model_dir = model_dir or self.model_dir
        os.makedirs(model_dir, exist_ok=True)
        payload = dataclasses.asdict(self)
        with open(os.path.join(model_dir, "train-params.json"), "w") as f:
            json.dump(payload, f, indent=2, default=list)
        # reference-compatible key: value dump (myutils.py:29-32 format)
        with open(os.path.join(model_dir, "train-params.txt"), "w") as f:
            for k, v in payload.items():
                if isinstance(v, tuple):
                    v = list(v)
                f.write(f"{k}: {v}\n")

    @classmethod
    def load(cls, model_dir: str,
             compute_dtype: str | None = None) -> "TrainConfig":
        """Load saved params. `compute_dtype` overrides the dtype recorded
        at training time (a pure compute-cast choice — master weights are
        f32 in checkpoints either way); used by eval/deploy `--compute_dtype`.
        The override is never persisted back."""
        json_fn = os.path.join(model_dir, "train-params.json")
        if os.path.exists(json_fn):
            cfg = cls(**_coerce(json.load(open(json_fn))))
        else:
            txt_fn = os.path.join(model_dir, "train-params.txt")
            assert os.path.exists(txt_fn), f"no train params in {model_dir}"
            cfg = cls(**_coerce(_parse_txt(txt_fn)))
        if compute_dtype is not None:
            cfg.compute_dtype = compute_dtype
        return cfg


def _parse_txt(fn: str) -> dict:
    """Parse the reference 'key: value' format incl. its list syntax
    (myutils.py:40-85 semantics, with old-checkpoint defaults)."""
    raw = {}
    for line in open(fn):
        if ":" not in line:
            continue
        k, v = line.split(":", 1)
        raw[k.strip()] = v.strip()
    out: dict[str, Any] = {}
    known = {f.name for f in dataclasses.fields(TrainConfig)}

    def parse_value(key, val):
        if val in ("None", ""):
            return None
        if val in ("True", "False"):
            return val == "True"
        if val.startswith("["):
            inner = val[1:-1].strip()
            if not inner:
                return ()
            items = [s.strip().strip("'\"") for s in inner.split(",")]
            try:
                return tuple(int(i) for i in items)
            except ValueError:
                return tuple(items)
        for cast in (int, float):
            try:
                return cast(val)
            except ValueError:
                continue
        return val

    for k, v in raw.items():
        if k in known:
            out[k] = parse_value(k, v)
    return out


def _coerce(payload: dict) -> dict:
    known = {f.name for f in dataclasses.fields(TrainConfig)}
    out = {k: v for k, v in payload.items() if k in known}
    for key in ("encoders", "context_units", "freq_mask_units", "loc_units", "frame_hw"):
        if key in out and isinstance(out[key], list):
            out[key] = tuple(out[key])
    return out
