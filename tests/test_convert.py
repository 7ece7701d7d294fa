"""TF1-name <-> Flax-path conversion roundtrip tests."""

import jax
import numpy as np
import pytest

from spatialaudiogen_tpu.models import SptAudioGen, SptAudioGenConfig
from spatialaudiogen_tpu.models.convert import (
    flax_path_index,
    normalize_tf_name,
    restore_tf_var_dict,
)


def test_normalize_names():
    assert normalize_tf_name("audio_encoder/conv1/weights") == "audio_encoder/conv1/kernel"
    assert normalize_tf_name("video_encoder/conv1/conv/weights") == "video_encoder/conv1/kernel"
    assert normalize_tf_name("video_encoder/conv2_1/conv_1/bn/gamma") == \
        "video_encoder/conv2_1/conv_1/bn/scale"
    assert normalize_tf_name("separation/deconv3/weights") == "separation/deconv3/kernel"
    assert normalize_tf_name("localization/fc2/biases") == "localization/fc2/bias"
    assert normalize_tf_name("x/bn/moving_variance") == "x/bn/var"


import functools


@functools.lru_cache(maxsize=None)
def _model_variables(encoders=("audio", "video")):
    # cached: the full-geometry init is seconds of CPU work and the three
    # interop tests share it read-only per encoder config
    cfg = SptAudioGenConfig(encoders=tuple(encoders), separation="unet_mask",
                            sep_num_tracks=4)
    g = cfg.geometry
    model = SptAudioGen(cfg)
    audio = np.zeros((1, g.snd_size, 1), np.float32)
    video = np.zeros((1, 1, 64, 128, 3), np.float32) if "video" in encoders else None
    flow = np.zeros((1, 1, 64, 128, 3), np.float32) if "flow" in encoders else None
    return cfg, model, model.init(jax.random.PRNGKey(0), audio, video, flow,
                                  train=False)


def test_every_param_has_unique_tf_name():
    _, _, variables = _model_variables()
    index = flax_path_index(variables)
    # all kernels/biases/bn params representable (no collisions raised in build)
    assert any(k.startswith("audio_encoder/conv1") for k in index)
    assert any(k.startswith("video_encoder/conv5_2") for k in index)
    assert any(k.startswith("separation/deconv1") for k in index)


# TF leaf names, inverse of convert._LEAF_MAP (for synthesizing TF var dicts)
_INV_LEAF = {"kernel": "weights", "bias": "biases", "scale": "gamma",
             "mean": "moving_mean", "var": "moving_variance"}


def _tf_name(norm_key, path):
    parts = norm_key.split("/")
    leaf = path[-1]
    if leaf == "bias" and parts[-2:][0] == "bn":
        parts[-1] = "beta"
    else:
        parts[-1] = _INV_LEAF[leaf]
    return "/".join(parts)


def _get(tree, path):
    node = tree
    for p in path:
        node = node[p]
    return node


def _synth_tf_vars(variables, seed=0, perturb=0.01):
    """A TF-style {name: array} dict mirroring the model's own params."""
    index = flax_path_index(variables)
    rng = np.random.RandomState(seed)
    tf_vars = {}
    for norm_key, (coll, path, shape) in index.items():
        value = np.asarray(_get(variables[coll], path))
        value = value + rng.randn(*value.shape).astype(value.dtype) * perturb
        name = _tf_name(norm_key, path)
        if "deconv" in name and name.endswith("weights"):
            value = value.transpose(0, 1, 3, 2)  # TF deconv is (H, W, out, in)
        tf_vars[name] = value
    return tf_vars


ENCODER_CONFIGS = [("audio",), ("audio", "video"), ("audio", "video", "flow")]


@pytest.mark.parametrize("encoders", ENCODER_CONFIGS,
                         ids=["audio", "audio_rgb", "audio_rgb_flow"])
def test_restore_tf_var_dict_roundtrip(encoders):
    """Dump the model's own params under TF names, perturb, restore, compare.

    Covers every released-model graph shape incl. the 3-encoder
    audio+RGB+flow config (reference model.py:383-396 builds video_encoder
    AND flow_encoder scopes; README.md:70-78)."""
    _, _, variables = _model_variables(encoders)
    index = flax_path_index(variables)
    tf_name, get = _tf_name, _get
    tf_vars = _synth_tf_vars(variables)
    if "flow" in encoders:
        assert any(k.startswith("flow_encoder/") for k in tf_vars)

    new_vars, unmatched = restore_tf_var_dict(tf_vars, variables)
    assert unmatched == {}, unmatched
    # every parameter changed to the perturbed values
    new_index = flax_path_index(new_vars)
    for norm_key, (coll, path, _) in index.items():
        old = np.asarray(get(variables[coll], path))
        new = np.asarray(get(new_vars[coll], path))
        assert not np.allclose(old, new), norm_key
        name = tf_name(norm_key, path)
        expected = tf_vars[name]
        if "deconv" in name and name.endswith("weights"):
            expected = expected.transpose(0, 1, 3, 2)
        np.testing.assert_allclose(new, expected.reshape(new.shape), atol=1e-6)


@pytest.mark.parametrize("encoders", ENCODER_CONFIGS,
                         ids=["audio", "audio_rgb", "audio_rgb_flow"])
def test_import_tf_bundle_end_to_end(tmp_path, encoders):
    """A TF1 TensorBundle on disk imports to an orbax checkpoint, TF-free.

    Covers the released-model ingestion path (reference README.md:70-78)
    for every released graph shape — audio-only, audio+RGB, and the full
    audio+RGB+flow 3-encoder config (model.py:391-396 flow_encoder scope):
    write the model's variables as a real model.ckpt-N bundle (with Adam
    slot noise that must be filtered), run tools/import_tf_checkpoint.py on
    it, check the restored checkpoint carries 100% of the bundle's model
    variables, and (3-encoder case) that tools/compare_activations.py
    agrees with the source variables' activations on the imported weights.
    """
    import os
    import sys

    from spatialaudiogen_tpu.config import TrainConfig
    from spatialaudiogen_tpu.utils.tf_bundle import save_tf_checkpoint

    cfg, model, variables = _model_variables(encoders)
    tf_vars = _synth_tf_vars(variables, seed=3)
    n_model_vars = len(tf_vars)
    # optimizer slots + step bookkeeping the importer must drop
    some = list(tf_vars)[:3]
    for name in some:
        tf_vars[name + "/Adam"] = np.zeros_like(tf_vars[name])
        tf_vars[name + "/Adam_1"] = np.zeros_like(tf_vars[name])
    tf_vars["beta1_power"] = np.array(0.9, np.float32)
    tf_vars["global_step"] = np.array(152000, np.int64)

    ckpt_dir = tmp_path / "tf_model"
    ckpt_dir.mkdir()
    save_tf_checkpoint(str(ckpt_dir / "model.ckpt-152000"), tf_vars)

    model_dir = str(tmp_path / "model")
    os.makedirs(model_dir)
    tc = TrainConfig(model_dir=model_dir, encoders=tuple(encoders),
                     separation="unet_mask", num_sep_tracks=4,
                     frame_hw=(64, 128))
    tc.save(model_dir)

    sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "tools"))
    import import_tf_checkpoint

    import_tf_checkpoint.main([model_dir, str(ckpt_dir), "--step", "152000"])

    import jax

    from spatialaudiogen_tpu.train.checkpoint import restore_checkpoint
    from spatialaudiogen_tpu.train.lr import make_optimizer
    from spatialaudiogen_tpu.train.state import create_train_state

    g = cfg.geometry
    example = {"ambix": np.zeros((1, g.snd_size, g.num_ambi_channels), np.float32),
               "audio_mask": np.ones((1, g.num_ambi_channels), np.float32)}
    for mod in ("video", "flow"):
        if mod in encoders:
            example[mod] = np.zeros((1, g.vid_dur, 64, 128, 3), np.float32)
    target = create_train_state(model, make_optimizer(), jax.random.PRNGKey(1),
                                example)
    state, step = restore_checkpoint(model_dir, target)
    assert step == 152000
    index = flax_path_index({"params": state.params,
                             "batch_stats": state.batch_stats})
    matched = 0
    for norm_key, (coll, path, _) in index.items():
        got = np.asarray(_get({"params": state.params,
                               "batch_stats": state.batch_stats}[coll], path))
        expected = tf_vars[_tf_name(norm_key, path)]
        if "deconv" in norm_key and path[-1] == "kernel":
            expected = expected.transpose(0, 1, 3, 2)
        np.testing.assert_allclose(got, expected.reshape(got.shape), atol=1e-6)
        matched += 1
    assert matched == n_model_vars  # 100% of model variables mapped

    if "flow" in encoders:
        # compare_activations must agree: goldens = the source variables
        # (restored directly from the tf dict) applied to random inputs;
        # the tool runs the IMPORTED checkpoint on the same inputs.
        from spatialaudiogen_tpu.models.convert import restore_tf_var_dict

        import compare_activations

        src_vars, unmatched = restore_tf_var_dict(
            {k: v for k, v in tf_vars.items()
             if "/Adam" not in k and k not in ("beta1_power", "global_step")},
            variables)
        assert unmatched == {}
        rng = np.random.RandomState(11)
        blob = {"input/audio":
                rng.randn(2, g.snd_size, g.num_in_channels).astype(np.float32) * 0.1,
                "input/video": rng.rand(2, g.vid_dur, 64, 128, 3).astype(np.float32) - 0.5,
                "input/flow": rng.rand(2, g.vid_dur, 64, 128, 3).astype(np.float32) - 0.5}
        _, ends = model.apply(src_vars, blob["input/audio"], blob["input/video"],
                              blob["input/flow"], train=False, return_ends=True)
        goldens_fn = str(tmp_path / "goldens.npz")
        np.savez(goldens_fn, **blob,
                 **{k: np.asarray(v) for k, v in ends.items()})
        assert compare_activations.main([model_dir, goldens_fn, "--atol", "1e-4"]) == 0


@pytest.mark.parametrize("encoders", ENCODER_CONFIGS,
                         ids=["audio", "audio_rgb", "audio_rgb_flow"])
def test_export_to_tf_bundle_roundtrip(tmp_path, encoders):
    """orbax checkpoint -> TF1 bundle -> back: the exported bundle carries
    exactly the model's variables under reference TF names, for every
    released graph shape incl. audio+RGB+flow (model.py:391-396)."""
    import os
    import sys

    import jax

    from spatialaudiogen_tpu.config import TrainConfig
    from spatialaudiogen_tpu.models.convert import restore_tf_var_dict, to_tf_var_dict
    from spatialaudiogen_tpu.train.checkpoint import save_checkpoint
    from spatialaudiogen_tpu.train.lr import make_optimizer
    from spatialaudiogen_tpu.train.state import create_train_state
    from spatialaudiogen_tpu.utils.tf_bundle import load_tf_checkpoint

    cfg, model, variables = _model_variables(encoders)
    model_dir = str(tmp_path / "model")
    os.makedirs(model_dir)
    TrainConfig(model_dir=model_dir, encoders=tuple(encoders),
                separation="unet_mask", num_sep_tracks=4,
                frame_hw=(64, 128)).save(model_dir)
    g = cfg.geometry
    example = {"ambix": np.zeros((1, g.snd_size, g.num_ambi_channels), np.float32),
               "audio_mask": np.ones((1, g.num_ambi_channels), np.float32)}
    for mod in ("video", "flow"):
        if mod in encoders:
            example[mod] = np.zeros((1, g.vid_dur, 64, 128, 3), np.float32)
    state = create_train_state(model, make_optimizer(), jax.random.PRNGKey(2),
                               example)
    save_checkpoint(model_dir, state, 77)

    sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "tools"))
    import export_to_tf_bundle

    out_dir = str(tmp_path / "tf_out")
    export_to_tf_bundle.main([model_dir, out_dir])
    blobs = load_tf_checkpoint(out_dir, verify_crc=True)
    assert blobs.pop("global_step") == 77
    expected = to_tf_var_dict({"params": state.params,
                               "batch_stats": state.batch_stats})
    assert set(blobs) == set(expected)
    for name in expected:
        np.testing.assert_allclose(blobs[name], expected[name], atol=0)
    # and the bundle re-imports cleanly onto a fresh tree
    _, unmatched = restore_tf_var_dict(blobs, variables)
    assert unmatched == {}
