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


def _model_variables():
    cfg = SptAudioGenConfig(encoders=("audio", "video"), separation="unet_mask",
                            sep_num_tracks=4)
    g = cfg.geometry
    model = SptAudioGen(cfg)
    audio = np.zeros((1, g.snd_size, 1), np.float32)
    video = np.zeros((1, 1, 64, 128, 3), np.float32)
    return cfg, model, model.init(jax.random.PRNGKey(0), audio, video, train=False)


def test_every_param_has_unique_tf_name():
    _, _, variables = _model_variables()
    index = flax_path_index(variables)
    # all kernels/biases/bn params representable (no collisions raised in build)
    assert any(k.startswith("audio_encoder/conv1") for k in index)
    assert any(k.startswith("video_encoder/conv5_2") for k in index)
    assert any(k.startswith("separation/deconv1") for k in index)


def test_restore_tf_var_dict_roundtrip():
    """Dump the model's own params under TF names, perturb, restore, compare."""
    _, _, variables = _model_variables()
    index = flax_path_index(variables)

    # synthesize a TF-style var dict from the flax tree with TF leaf names
    inv_leaf = {"kernel": "weights", "bias": "biases", "scale": "gamma",
                "mean": "moving_mean", "var": "moving_variance"}

    def tf_name(norm_key, path):
        parts = norm_key.split("/")
        leaf = path[-1]
        if leaf == "bias" and parts[-2:][0] == "bn":
            parts[-1] = "beta"
        else:
            parts[-1] = inv_leaf[leaf]
        return "/".join(parts)

    def get(tree, path):
        node = tree
        for p in path:
            node = node[p]
        return node

    rng = np.random.RandomState(0)
    tf_vars = {}
    for norm_key, (coll, path, shape) in index.items():
        value = np.asarray(get(variables[coll], path))
        value = value + rng.randn(*value.shape).astype(value.dtype) * 0.01
        name = tf_name(norm_key, path)
        if "deconv" in name and name.endswith("weights"):
            # TF deconv kernels are (H, W, out, in)
            value = value.transpose(0, 1, 3, 2)
        tf_vars[name] = value

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
