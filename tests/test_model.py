"""Shape/structure tests for the SptAudioGen Flax model."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from spatialaudiogen_tpu.models import SptAudioGen, SptAudioGenConfig
from spatialaudiogen_tpu.models.layers import l2_regularization


def _init_and_run(cfg, batch=2, frame_hw=(224, 448), seed=0):
    g = cfg.geometry
    rng = np.random.RandomState(seed)
    audio = jnp.asarray(rng.randn(batch, g.snd_size, g.num_in_channels), jnp.float32)
    video = flow = None
    if "video" in cfg.encoders:
        video = jnp.asarray(rng.rand(batch, g.vid_dur, *frame_hw, 3), jnp.float32) - 0.5
    if "flow" in cfg.encoders:
        flow = jnp.asarray(rng.rand(batch, g.vid_dur, *frame_hw, 3), jnp.float32) - 0.5
    model = SptAudioGen(cfg)
    variables = model.init(jax.random.PRNGKey(0), audio, video, flow, train=False)
    out, ends = model.apply(variables, audio, video, flow, train=False, return_ends=True)
    return model, variables, out, ends


def test_audio_only_nosep_shapes():
    cfg = SptAudioGenConfig(encoders=("audio",), separation="none")
    g = cfg.geometry
    model, variables, out, ends = _init_and_run(cfg)
    assert out.shape == (2, g.snd_dur, 3)
    assert ends["audio_encoder"].shape == (2, 3, 6, 512)
    assert ends["bottleneck"].shape == (2, 3, 1024)
    assert ends["localization/weights"].shape == (2, 4800, 3, 1, 1)
    assert ends["separation"].shape == (2, 1, 1, 4800)


def test_audio_only_unet_shapes():
    cfg = SptAudioGenConfig(encoders=("audio",), separation="unet_mask")
    g = cfg.geometry
    model, variables, out, ends = _init_and_run(cfg)
    assert out.shape == (2, g.snd_dur, 3)
    assert ends["separation"].shape == (2, 1, 32, 4800)
    assert ends["localization/weights"].shape == (2, 4800, 3, 1, 32)
    assert ends["localization/biases"].shape == (2, 4800, 3, 1)


def test_audio_video_unet_shapes():
    cfg = SptAudioGenConfig(encoders=("audio", "video"), separation="unet_mask")
    model, variables, out, ends = _init_and_run(cfg)
    assert out.shape == (2, 4800, 3)
    assert ends["video_encoder"].shape == (2, 7, 14, 512)  # B*T with T=1
    assert ends["bottleneck"].shape == (2, 3, 1024 + 512)


def test_audio_video_flow_bottleneck_width():
    cfg = SptAudioGenConfig(encoders=("audio", "video", "flow"), separation="none")
    model, variables, out, ends = _init_and_run(cfg, frame_hw=(64, 128))
    assert ends["bottleneck"].shape == (2, 3, 1024 + 512 + 512)
    assert out.shape == (2, 4800, 3)


def test_param_tree_names_match_tf_scopes():
    cfg = SptAudioGenConfig(encoders=("audio", "video"), separation="unet_mask")
    model, variables, _, _ = _init_and_run(cfg, frame_hw=(64, 128))
    params = variables["params"]
    assert set(params["audio_encoder"].keys()) == {f"conv{i}" for i in range(1, 6)}
    assert "conv" in params["audio_encoder"]["conv1"]
    assert {"conv2_1", "conv5_2", "conv1"} <= set(params["video_encoder"].keys())
    assert {"audio-fc", "video-fc-red", "video-fc"} <= set(params["bottleneck"].keys())
    assert {"fc1", "fc2", "fc3"} <= set(params["localization"].keys())
    assert {"fc-feats", "deconv1", "deconv5"} <= set(params["separation"].keys())
    # batch_stats only exist under the visual encoder (audio convs have no BN)
    assert "video_encoder" in variables["batch_stats"]
    assert "audio_encoder" not in variables["batch_stats"]


def test_audio_conv_stack_trace():
    """Pin the per-layer activation shapes of SURVEY/model-trace."""
    cfg = SptAudioGenConfig(encoders=("audio",), separation="unet_mask")
    g = cfg.geometry
    rng = np.random.RandomState(0)
    audio = jnp.asarray(rng.randn(1, g.snd_size, 1), jnp.float32)
    model = SptAudioGen(cfg)
    variables = model.init(jax.random.PRNGKey(0), audio, train=False)

    from spatialaudiogen_tpu.models.sptaudiogen import AudioEncoder
    from spatialaudiogen_tpu.ops.dft import stft_real

    re, im = stft_real(audio.transpose(0, 2, 1), g.wind_size, 4,
                       frame_start=g.enc_ss, n_frames=g.n_enc_frames)
    mag = jnp.sqrt(re * re + im * im).transpose(0, 2, 3, 1)
    acts = AudioEncoder(cfg).apply({"params": variables["params"]["audio_encoder"]}, mag)
    shapes = [tuple(a.shape) for a in acts]
    assert shapes == [(1, 127, 1024, 1), (1, 31, 127, 32), (1, 15, 31, 64),
                      (1, 7, 14, 128), (1, 5, 10, 256), (1, 3, 6, 512)]


def test_weight_decay_excludes_localization_output():
    cfg = SptAudioGenConfig(encoders=("audio",), separation="none")
    model, variables, _, _ = _init_and_run(cfg)
    params = variables["params"]
    full = l2_regularization(params, 5e-4)
    excl = l2_regularization(params, 5e-4, exclude=model.no_decay_paths())
    # fc3 kernel is tiny-init so the difference is small but strictly positive
    assert float(full) > float(excl) >= 0.0


def test_nosep_passthrough_is_identity_crop():
    """With separation='none' the separated track must be the mono crop."""
    cfg = SptAudioGenConfig(encoders=("audio",), separation="none")
    g = cfg.geometry
    rng = np.random.RandomState(1)
    audio = jnp.asarray(rng.randn(1, g.snd_size, 1), jnp.float32)
    model = SptAudioGen(cfg)
    variables = model.init(jax.random.PRNGKey(0), audio, train=False)
    _, ends = model.apply(variables, audio, train=False, return_ends=True)
    np.testing.assert_allclose(
        np.asarray(ends["separation"][0, 0, 0]),
        np.asarray(audio[0, g.nosep_ss: g.nosep_ss + g.snd_dur, 0]), atol=1e-7)


def test_decoder_linear_synthesis():
    """Decoder must equal sum_{in,tr} w*s + b computed by hand."""
    cfg = SptAudioGenConfig(encoders=("audio",), separation="unet_mask",
                            sep_num_tracks=4)
    g = cfg.geometry
    rng = np.random.RandomState(2)
    audio = jnp.asarray(rng.randn(1, g.snd_size, 1), jnp.float32)
    model = SptAudioGen(cfg)
    variables = model.init(jax.random.PRNGKey(0), audio, train=False)
    out, ends = model.apply(variables, audio, train=False, return_ends=True)
    w = np.asarray(ends["localization/weights"])   # (1,T,3,1,4)
    b = np.asarray(ends["localization/biases"])    # (1,T,3,1)
    s = np.asarray(ends["separation"])             # (1,1,4,T)
    manual = (w * s.transpose(0, 3, 1, 2)[:, :, None, :, :]).sum((3, 4)) + b[..., 0]
    np.testing.assert_allclose(np.asarray(out), manual, atol=1e-4, rtol=1e-4)


def test_nhwc_pallas_path_matches_xla(monkeypatch):
    """The NHWC-mask Pallas path (pallas_nhwc, mono input) must produce the
    same model output and sow the same oracle mask tap as the XLA path.
    Pallas runs in interpret mode here (CPU test host)."""
    import spatialaudiogen_tpu.models.sptaudiogen as M
    import spatialaudiogen_tpu.ops.pallas_kernels as K

    monkeypatch.setattr(M, "_pallas_enabled", lambda mode: mode != "off")
    orig = K.masked_istft_nhwc_pallas
    monkeypatch.setattr(
        K, "masked_istft_nhwc_pallas",
        lambda re, im, m, n, _i, _p: orig(re, im, m, n, True, "highest"))

    cfg_xla = SptAudioGenConfig(encoders=("audio",), separation="unet_mask",
                                use_pallas="off")
    cfg_nhwc = SptAudioGenConfig(encoders=("audio",), separation="unet_mask",
                                 use_pallas="on", pallas_nhwc=True)
    g = cfg_xla.geometry
    rng = np.random.RandomState(3)
    audio = jnp.asarray(rng.randn(1, g.snd_size, 1), jnp.float32)
    model_x = SptAudioGen(cfg_xla)
    variables = model_x.init(jax.random.PRNGKey(0), audio, train=False)
    out_x, state_x = model_x.apply(variables, audio, train=False,
                                   mutable=["intermediates"])
    out_n, state_n = SptAudioGen(cfg_nhwc).apply(variables, audio, train=False,
                                                 mutable=["intermediates"])
    np.testing.assert_allclose(np.asarray(out_n), np.asarray(out_x),
                               atol=2e-4, rtol=1e-4)
    mask_x = np.asarray(state_x["intermediates"]["separation"]["mask"][0])
    mask_n = np.asarray(state_n["intermediates"]["separation"]["mask"][0])
    assert mask_n.shape == mask_x.shape
    np.testing.assert_allclose(mask_n, mask_x, atol=1e-6)


@pytest.mark.parametrize("strides,kernel", [((4, 8), (7, 16)), ((2, 4), (3, 7)),
                                            ((2, 2), (3, 5)), ((1, 1), (3, 5))])
def test_deconv_custom_vjp_matches_stock(strides, kernel):
    """Deconv2D's reverse-free custom VJP vs flax ConvTranspose: identical
    param trees, bit-equal forward, gradients to f32 reduction noise. The
    custom backward keeps XLA from materializing a spatial reverse of the
    full output cotangent (tools/roofline.py: ~5 ms of the flagship train
    step as reverse + layout copies at batch 128)."""
    from spatialaudiogen_tpu.models.layers import Deconv2D

    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(2, 6, 17, 10).astype(np.float32))
    new = Deconv2D(5, kernel, strides, custom_vjp=True)
    old = Deconv2D(5, kernel, strides, custom_vjp=False)
    v_new = new.init(jax.random.PRNGKey(3), x)
    v_old = old.init(jax.random.PRNGKey(3), x)
    chex_equal = jax.tree_util.tree_all(jax.tree_util.tree_map(
        lambda a, b: bool(jnp.array_equal(a, b)), v_new, v_old))
    assert chex_equal, "param trees differ"
    y_new = new.apply(v_new, x)
    y_old = old.apply(v_old, x)
    np.testing.assert_array_equal(np.asarray(y_new), np.asarray(y_old))

    ct = jnp.asarray(rng.randn(*y_new.shape).astype(np.float32))
    gp_new, gx_new = jax.grad(
        lambda v, a: jnp.sum(new.apply(v, a) * ct), (0, 1))(v_new, x)
    gp_old, gx_old = jax.grad(
        lambda v, a: jnp.sum(old.apply(v, a) * ct), (0, 1))(v_old, x)
    np.testing.assert_allclose(np.asarray(gx_new), np.asarray(gx_old),
                               rtol=1e-5, atol=1e-4)
    key = lambda e: str(e[0])
    for (pa, a), (pb, b) in zip(
            sorted(jax.tree_util.tree_leaves_with_path(gp_new), key=key),
            sorted(jax.tree_util.tree_leaves_with_path(gp_old), key=key)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-4, err_msg=str(pa))
