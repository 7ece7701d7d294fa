"""SptAudioGen: mono + video -> first-order-ambisonics, as a Flax module.

Re-design of the reference network (model.py:24-434) for TPU:

  * STFT / masked-ISTFT run as real matmuls on the MXU (ops.dft), computed
    only over the frame range the network consumes.
  * Audio U-Net (VALID conv/deconv), ResNet18 visual encoders, FC bottleneck
    and localization head are Flax modules named to mirror the TF scopes so
    released TF1 checkpoints convert 1:1 (models.convert).
  * All crop indices come from dsp.geometry.ModelGeometry (py2-faithful).

Tensor trace at defaults (audio+video, unet_mask, order 1, batch B):
  audio (B, 52799, 1) -> stft frames [46:173) -> mag (B, 127, 1024, 1)
  conv stack -> (B,31,127,32)(B,15,31,64)(B,7,14,128)(B,5,10,256)(B,3,6,512)
  video (B, 1, 224, 448, 3) -> ResNet18@conv5_2 -> (B, 7, 14, 512)
  bottleneck -> (B, 3, 1536); localization -> w (B,4800,3,1,32), b (B,4800,3,1)
  separation mask (B,1,32,28,1024); masked ISTFT -> (B,1,32,4800)
  decode: sum_{in,track} w*s + b -> (B, 4800, 3)
"""

from __future__ import annotations

import dataclasses
from typing import Any

import flax.linen as nn
import jax.numpy as jnp

from spatialaudiogen_tpu.dsp.geometry import ModelGeometry
from spatialaudiogen_tpu.models.layers import Conv2D, Deconv2D, dense, loc_output_init
from spatialaudiogen_tpu.models.resnet import ResNet18
from spatialaudiogen_tpu.ops.dft import (
    istft_from_masked_hermitian,
    istft_real,
    mirror_hermitian_magnitude,
    stft_real,
)

AUDIO, VIDEO, FLOW = "audio", "video", "flow"
ENCODERS = (AUDIO, VIDEO, FLOW)
NO_SEPARATION, FREQ_MASK = "none", "unet_mask"

def _pallas_enabled(mode: str) -> bool:
    if mode == "on":
        return True
    if mode == "off":
        return False
    import jax

    return jax.devices()[0].platform in ("tpu", "axon")


# Audio U-Net architecture constants (model.py:162-164).
AUDIO_FILTERS = (32, 64, 128, 256, 512)
AUDIO_KERNELS = ((7, 16), (3, 7), (3, 5), (3, 5), (3, 5))
AUDIO_STRIDES = ((4, 8), (2, 4), (2, 2), (1, 1), (1, 1))


@dataclasses.dataclass(frozen=True)
class SptAudioGenConfig:
    ambi_order: int = 1
    audio_rate: int = 48000
    video_rate: int = 10
    context: float = 1.0
    sample_duration: float = 0.1
    encoders: tuple = (AUDIO, VIDEO)
    separation: str = FREQ_MASK
    sep_num_tracks: int = 32
    loc_fc_units: tuple = (512, 512)
    # Present for CLI/config parity; the reference defines but never uses
    # these in the network (SptAudioGenParams fields, model.py:13-15).
    ctx_feats_fc_units: tuple = (64, 128, 128)
    sep_freq_mask_fc_units: tuple = (256,)
    sep_fft_window: float = 0.025
    dft_precision: str = "highest"
    # Precision of the fused Pallas masked-iDFT matmuls. "default" is one
    # bf16 MXU pass: the synthesized waveform sits 53 dB above its error
    # floor vs the "highest" (six-pass, ~1e-7) kernels — inaudible and a
    # ppm-level perturbation of the eval metrics — while the model forward
    # runs ~1.4x faster (420x vs 297x realtime at deploy batch 128). Set
    # "highest" for bit-level parity investigations; the analysis STFT and
    # the XLA fallback paths always use `dft_precision`.
    pallas_precision: str = "default"
    # Exploit Hermitian symmetry of the real-input spectrum: analysis and
    # masked synthesis run on wind/2+1 bins (exact algebra, ~2x fewer DFT
    # FLOPs). Measured SLOWER on v5e despite fewer FLOPs — 513-wide matmuls
    # pad to 5x128 lanes and relayout costs exceed the savings — so the
    # default stays on the full-bin formulation; flip for narrow-MXU parts.
    hermitian_dft: bool = False
    # Fused Pallas masked-ISTFT kernel (ops.pallas_kernels): masked spectra
    # stay in VMEM through the iDFT matmuls and overlap-add — measured 3.2x
    # faster than the XLA formulation on v5e. 'auto' uses it on TPU backends
    # and the XLA path elsewhere; 'on'/'off' force it.
    use_pallas: str = "auto"
    # Feed the mask to the Pallas kernel in its deconv-native NHWC layout
    # (mono input only): the NHWC->track-major relayout then happens on VMEM
    # blocks in-kernel instead of as the model-graph layout-copy chain.
    # Measured SLOWER on v5e (mask-chain+ISTFT 23.4 ms vs 7.8 ms at batch
    # 128, f32): Mosaic's lane<->sublane transposes of (T*FB, 32) blocks
    # cost ~2x the whole XLA relayout chain they replace, and the f-chunked
    # contraction fragments the iDFT matmuls (K=128/pass). Kept for parts
    # where XLA's copy is the bottleneck; see PERF.md.
    pallas_nhwc: bool = False
    # Rematerialize the encoder/separation activations in the backward pass
    # (jax.checkpoint via nn.remat) — trades ~1/3 extra forward FLOPs for the
    # U-Net's large intermediates, enabling bigger per-chip batches.
    remat: bool = False
    dtype: Any = None  # compute dtype for conv/fc stacks (None = float32)
    # Reference quirk: BN inside the visual encoders always uses batch stats
    # (is_training=finetune=True even at eval, model.py:388,396).
    bn_batch_stats: bool = True

    def __post_init__(self):
        assert all(e in ENCODERS for e in self.encoders)
        assert self.separation in (NO_SEPARATION, FREQ_MASK)
        if set(self.encoders) & {VIDEO, FLOW}:
            vid_dur = self.sample_duration * self.video_rate
            # tolerance-based integer check: 0.07 * 100 != 7.0 exactly
            vid_dur = round(vid_dur) if abs(vid_dur - round(vid_dur)) < 1e-6 \
                else vid_dur
            assert vid_dur >= 1 and vid_dur == int(vid_dur), (
                f"visual encoders require sample_duration*video_rate to be a "
                f"positive integer (got {vid_dur}). The reference only "
                f"supports ==1 (model.py:216-232 would mis-batch more); here "
                f"the bottleneck aligns each frame to its audio steps, so "
                f"any integer works if the audio feature steps divide by it")

    @property
    def geometry(self) -> ModelGeometry:
        return ModelGeometry(self.ambi_order, self.audio_rate, self.video_rate,
                             self.context, self.sample_duration, self.sep_fft_window)

    @property
    def num_tracks(self) -> int:
        return 1 if self.separation == NO_SEPARATION else self.sep_num_tracks


class AudioEncoder(nn.Module):
    """5-layer VALID conv stack over |STFT| (model.py:161-187)."""

    cfg: SptAudioGenConfig

    @nn.compact
    def __call__(self, mag):
        acts = [mag]
        x = mag
        for i, (nf, fs, st) in enumerate(zip(AUDIO_FILTERS, AUDIO_KERNELS, AUDIO_STRIDES)):
            x = Conv2D(nf, fs, st, padding="VALID", activation=nn.relu,
                       dtype=self.cfg.dtype, name=f"conv{i + 1}")(x)
            acts.append(x)
        return acts


class Bottleneck(nn.Module):
    """Per-modality FC reduction + fusion concat (model.py:203-239).

    Generalizes the reference's implicit vid_dur==1 assumption
    (model.py:216-232 would silently mis-batch multi-frame windows): visual
    features arrive time-folded as (B*vid_t, h, w, c); each frame is reduced
    independently and its 512-d embedding repeated over the audio time steps
    it covers (nearest-frame alignment). For vid_t == 1 this is exactly the
    reference's tile — bit-identical params and outputs.
    """

    cfg: SptAudioGenConfig

    @nn.compact
    def __call__(self, enc: dict, use_audio: bool, vid_t: int = 1):
        parts = []
        assert AUDIO in enc, (
            "Bottleneck requires the audio encoder: visual-feature tiling is "
            "defined over the audio time axis (the reference reads "
            "x_enc[AUDIO] for it unconditionally, model.py:207,230); a "
            "video-only alignment would be a silent behavior fork")
        audio_t = enc[AUDIO].shape[1]
        for k in (AUDIO, VIDEO, FLOW):
            if k == AUDIO and not use_audio:
                continue
            if k not in enc:
                continue
            x = enc[k]
            if k != AUDIO:
                x = dense(x, 128, name=f"{k}-fc-red", activation=nn.relu, dtype=self.cfg.dtype)
                bt = x.shape[0]
                assert bt % vid_t == 0, (bt, vid_t)
                x = x.reshape(bt // vid_t, vid_t, -1)
                x = dense(x, 512, name=f"{k}-fc", activation=nn.relu, dtype=self.cfg.dtype)
                assert audio_t % vid_t == 0, (
                    f"audio feature steps ({audio_t}) must be a multiple of "
                    f"video frames per window ({vid_t}) to align modalities")
                x = jnp.repeat(x, audio_t // vid_t, axis=1)
            else:
                b, t = x.shape[:2]
                x = x.reshape(b, t, -1)
                x = dense(x, 1024, name=f"{k}-fc", activation=nn.relu, dtype=self.cfg.dtype)
            parts.append(x)
        return jnp.concatenate(parts, axis=2)


class LocalizationHead(nn.Module):
    """FC stack -> per-video-frame synthesis weights, tiled to audio rate
    (model.py:241-271)."""

    cfg: SptAudioGenConfig

    @nn.compact
    def __call__(self, x):
        g = self.cfg.geometry
        num_out, num_in = g.num_out_channels, g.num_in_channels
        tracks = self.cfg.num_tracks
        for i, units in enumerate(self.cfg.loc_fc_units):
            x = dense(x, units, name=f"fc{i + 1}", activation=nn.relu, dtype=self.cfg.dtype)
        x = dense(x, num_out * num_in * (tracks + 1),
                  name=f"fc{len(self.cfg.loc_fc_units) + 1}",
                  kernel_init=loc_output_init(0.001), dtype=self.cfg.dtype)
        b, t = x.shape[:2]
        x = x.reshape(b, t, num_out, num_in, tracks + 1)
        # NOTE: coefficients stay at video rate here; the decoder applies
        # them blockwise, which equals the reference's repeat-to-audio-rate
        # materialization (model.py:262-264) without the 4800x tensor.
        return x[..., :-1], x[..., -1]  # weights (B,T,out,in,tr), biases (B,T,out,in)


class SeparationUNet(nn.Module):
    """Deconv mirror of the audio encoder -> per-track sigmoid STFT mask ->
    masked comb ISTFT (model.py:282-348)."""

    cfg: SptAudioGenConfig

    @nn.compact
    def __call__(self, feats, audio_acts, stft_re, stft_im):
        cfg, g = self.cfg, self.cfg.geometry
        n_in = g.num_in_channels
        tracks = cfg.sep_num_tracks

        x = dense(feats, AUDIO_FILTERS[-1], name="fc-feats", activation=nn.relu, dtype=cfg.dtype)
        # tile features across the freq axis of the deepest audio map
        enc_freq = audio_acts[-1].shape[2]
        x = jnp.tile(x[:, :, None, :], (1, 1, enc_freq, 1))
        x = jnp.concatenate([audio_acts[-1], x], axis=3)

        out_filters = (tracks * n_in,) + AUDIO_FILTERS[:-1]
        for layer in reversed(range(len(AUDIO_FILTERS))):
            if layer == 0:
                # Only frames [deconv_ss, deconv_tt) of deconv1 survive the
                # mask crop; restrict computation to the contributing input
                # slice (exact — see geometry.deconv1_in_lo).
                x = x[:, g.deconv1_in_lo: g.deconv1_in_hi]
            x = Deconv2D(out_filters[layer], AUDIO_KERNELS[layer], AUDIO_STRIDES[layer],
                         dtype=cfg.dtype, name=f"deconv{layer + 1}")(x)
            if layer == 0:
                break
            x = jnp.concatenate([nn.relu(x), audio_acts[layer]], axis=3)

        # Sigmoid is always evaluated in f32; in the bf16 fast mode the mask
        # is *stored* bf16, halving the mask-tensor traffic through the
        # layout transpose below and through the backward pass. (The
        # NHWC->track-major transpose itself is unavoidable: XLA re-
        # canonicalizes both elementwise reorderings and NCHW-output deconvs
        # back to this same slice/copy pattern — measured identical 29.84 ms
        # batch-128 forwards for all three formulations; see PERF.md.)
        mask_dtype = jnp.float32 if cfg.dtype is None else cfg.dtype
        x = nn.sigmoid(x.astype(jnp.float32)).astype(mask_dtype)
        # mask crop in (narrowed) deconv-output frame coords (model.py:313-324)
        x = x[:, g.narrowed_deconv_ss: g.narrowed_deconv_ss + g.n_mask_frames]
        b = x.shape[0]

        # tap for the numpy parity oracle (tests/test_reference_oracle.py):
        # apply(..., mutable=["intermediates"]) recovers the learned mask.
        # Always sown in track-major view; DCE'd (transpose included) unless
        # the 'intermediates' collection is mutable.
        mask = (x.transpose(0, 3, 1, 2)
                .reshape(b, n_in, tracks, g.n_mask_frames, g.wind_size))
        self.sow("intermediates", "mask", mask)

        pallas_on = _pallas_enabled(cfg.use_pallas) and not cfg.hermitian_dft
        if pallas_on and cfg.pallas_nhwc and n_in == 1:
            # NHWC path: skip the track-major relayout entirely; the kernel
            # transposes VMEM-resident blocks in-kernel (see config note —
            # measured slower on v5e, default off).
            from spatialaudiogen_tpu.ops.pallas_kernels import (
                masked_istft_nhwc_pallas,
            )

            x_sep = masked_istft_nhwc_pallas(stft_re[:, 0], stft_im[:, 0], x,
                                             4, False, cfg.pallas_precision)
            return x_sep[:, None, :, g.out_ss: g.out_tt]

        # masked ISTFT: real mask times complex STFT == two real scalings
        if cfg.hermitian_dft:
            x_sep = istft_from_masked_hermitian(
                stft_re[:, :, None], stft_im[:, :, None], mask, 4,
                n_freqs=g.wind_size, precision=cfg.dft_precision)
        elif pallas_on:
            from spatialaudiogen_tpu.ops.pallas_kernels import masked_istft_pallas

            x_sep = masked_istft_pallas(stft_re, stft_im, mask, 4, False,
                                        cfg.pallas_precision)
        else:
            x_sep = istft_real(stft_re[:, :, None] * mask, stft_im[:, :, None] * mask,
                               4, precision=cfg.dft_precision)
        return x_sep[..., g.out_ss: g.out_tt]                # (B, n_in, tracks, snd_dur)


class SptAudioGen(nn.Module):
    """Full model; call with (audio, video, flow) -> (B, snd_dur, n_out)."""

    cfg: SptAudioGenConfig

    @nn.compact
    def __call__(self, audio, video=None, flow=None, train: bool = True,
                 return_ends: bool = False):
        cfg, g = self.cfg, self.cfg.geometry
        assert audio.shape[1] == g.snd_size, (audio.shape, g.snd_size)
        ends = {}

        mono = audio.transpose(0, 2, 1)                      # (B, n_in, snd_size)
        # STFT only over the frames the network touches ([enc_ss, enc_tt)),
        # and only the non-redundant half-spectrum when hermitian_dft is on.
        re, im = stft_real(mono, g.wind_size, 4, precision=cfg.dft_precision,
                           frame_start=g.enc_ss, n_frames=g.n_enc_frames,
                           half=cfg.hermitian_dft)

        audio_encoder_cls = nn.remat(AudioEncoder) if cfg.remat else AudioEncoder
        # static_argnums index includes the module itself (arg 0): `train` is 2
        resnet_cls = nn.remat(ResNet18, static_argnums=(2,)) if cfg.remat else ResNet18

        enc = {}
        if AUDIO in cfg.encoders:
            mag = jnp.sqrt(re * re + im * im)                # (B, n_in, T_enc, F')
            if cfg.hermitian_dft:
                mag = mirror_hermitian_magnitude(mag)        # back to full bins
            mag = mag.transpose(0, 2, 3, 1)                  # NHWC: (B, T_enc, F, n_in)
            self.sow("intermediates", "stft_mag", mag)       # numpy-oracle tap
            if cfg.dtype is not None:
                mag = mag.astype(cfg.dtype)
            acts = audio_encoder_cls(cfg, name="audio_encoder")(mag)
            enc[AUDIO] = acts
            ends["audio_encoder"] = acts[-1]

        bn_train = train or cfg.bn_batch_stats
        for name, frames in ((VIDEO, video), (FLOW, flow)):
            if name in cfg.encoders:
                assert frames is not None, f"{name} encoder requires {name} input"
                b, t = frames.shape[:2]
                x = frames.reshape((b * t,) + frames.shape[2:])
                if cfg.dtype is not None:
                    x = x.astype(cfg.dtype)
                y, _ = resnet_cls(truncate_at="conv5_2", dtype=cfg.dtype,
                                  name=f"{name}_encoder")(x, bn_train)
                enc[name] = y
                ends[f"{name}_encoder"] = y

        feats = Bottleneck(cfg, name="bottleneck")(
            {k: (v[-1] if k == AUDIO else v) for k, v in enc.items()},
            use_audio=AUDIO in cfg.encoders, vid_t=g.vid_dur)
        ends["bottleneck"] = feats

        weights, biases = LocalizationHead(cfg, name="localization")(feats)
        if return_ends:
            reps = g.snd_dur // weights.shape[1]
            ends["localization/weights"] = jnp.repeat(weights, reps, axis=1)
            ends["localization/biases"] = jnp.repeat(biases, reps, axis=1)

        if cfg.separation == NO_SEPARATION:
            x_sep = mono[:, :, g.nosep_ss: g.nosep_ss + g.snd_dur]
            x_sep = x_sep[:, :, None, :]                     # (B, n_in, 1, snd_dur)
        else:
            # the mask frames are a sub-range of the encoder frame range
            lo = g.mask_ss - g.enc_ss
            hi = g.mask_tt - g.enc_ss
            sep_cls = nn.remat(SeparationUNet) if cfg.remat else SeparationUNet
            x_sep = sep_cls(cfg, name="separation")(
                feats, enc[AUDIO], re[:, :, lo:hi], im[:, :, lo:hi])
        ends["separation"] = x_sep

        # decode: A_t = sum_tracks sum_in W_t * s_t + b_t (model.py:430),
        # applied blockwise: each video-rate coefficient covers
        # snd_dur/T consecutive audio samples.
        s = x_sep.transpose(0, 3, 1, 2).astype(jnp.float32)  # (B, snd_dur, n_in, tr)
        b, t_coef = weights.shape[:2]
        reps = g.snd_dur // t_coef
        s_blocks = s.reshape(b, t_coef, reps, g.num_in_channels, -1)
        ambi = jnp.einsum("btoik,btrik->btro", weights.astype(jnp.float32), s_blocks)
        ambi = ambi + biases[..., 0].astype(jnp.float32)[:, :, None]
        ambi = ambi.reshape(b, g.snd_dur, g.num_out_channels)
        ends["decoder/ambix"] = ambi
        return (ambi, ends) if return_ends else ambi

    def no_decay_paths(self) -> tuple:
        """Param path substrings excluded from L2 weight decay
        (the localization output layer, model.py:253-256)."""
        return (f"localization/fc{len(self.cfg.loc_fc_units) + 1}",)
