"""Generic-library surface tests: harness, RNN wrappers, ResNets, datasets."""

import jax
import jax.numpy as jnp
import numpy as np
import optax

from spatialaudiogen_tpu.data.generic import ArrayDataset, BackgroundGenerator, parallel_map
from spatialaudiogen_tpu.data.image_prep import distort_image, eval_image, imagenet_normalize
from spatialaudiogen_tpu.models.classification_metrics import accuracy, top_k_accuracy
from spatialaudiogen_tpu.models.embedding import Embedding
from spatialaudiogen_tpu.models.recurrent import BidirectionalRecurrent, Recurrent
from spatialaudiogen_tpu.models.resnet import ResNet50, ResNetBottleneck
from spatialaudiogen_tpu.train.harness import GenericHarness


def test_generic_harness_logistic_regression():
    """Mirror of the reference's dnn.py test_dnn synthetic smoke: two gaussian
    classes must reach high accuracy in a few epochs."""
    import flax.linen as nn

    rng = np.random.RandomState(0)
    n = 512
    x = np.concatenate([rng.randn(n, 8) + 1.5, rng.randn(n, 8) - 1.5]).astype(np.float32)
    y = np.concatenate([np.zeros(n, np.int32), np.ones(n, np.int32)])

    class Logistic(nn.Module):
        @nn.compact
        def __call__(self, x):
            return nn.Dense(2)(x)

    def xent(logits, labels):
        return optax.softmax_cross_entropy_with_integer_labels(logits, labels).mean()

    data = ArrayDataset(x, y, batch_size=64, seed=1)
    harness = GenericHarness(Logistic(), xent, {"acc": accuracy},
                             optimizer=optax.adam(1e-2), clip_norm=5.0)
    history = harness.fit(lambda: iter(data), epochs=3)
    final = harness.evaluate(lambda: iter(data))
    assert final["acc"] > 0.95
    assert history[-1]["loss"] < history[0]["loss"]
    preds = harness.predict(x[:5])
    assert preds.shape == (5, 2)


def test_recurrent_shapes():
    x = jnp.ones((2, 7, 5))
    for cell in ("rnn", "gru", "lstm"):
        mod = Recurrent(6, cell)
        y, _ = mod.init_with_output(jax.random.PRNGKey(0), x)
        assert y.shape == (2, 7, 6), cell
    bi = BidirectionalRecurrent(6, "gru")
    y, _ = bi.init_with_output(jax.random.PRNGKey(0), x)
    assert y.shape == (2, 7, 12)


def test_embedding():
    ids = jnp.array([[1, 2], [3, 0]])
    mod = Embedding(10, 4)
    y, _ = mod.init_with_output(jax.random.PRNGKey(0), ids)
    assert y.shape == (2, 2, 4)


def test_classification_metrics():
    logits = jnp.array([[1.0, 2.0, 0.0], [3.0, 0.0, 1.0]])
    labels = jnp.array([1, 2])
    assert float(accuracy(logits, labels)) == 0.5
    assert float(top_k_accuracy(logits, labels, k=2)) == 1.0


def test_resnet50_shapes_and_names():
    model = ResNet50(truncate_at="res5c")
    x = jnp.zeros((1, 64, 64, 3))
    (y, ends), variables = model.init_with_output(jax.random.PRNGKey(0), x, train=False)
    assert y.shape == (1, 2, 2, 2048)
    assert {"res2a", "res3a", "res4f", "res5c"} <= set(ends)
    params = variables["params"]
    assert "branch1" in params["res3a"] and "branch1" not in params["res2b"]
    assert "branch2a" in params["res2a"]


def test_resnet152_block_count():
    model = ResNetBottleneck(stage_blocks=(3, 8, 36, 3), truncate_at="res3h")
    x = jnp.zeros((1, 32, 32, 3))
    (y, ends), _ = model.init_with_output(jax.random.PRNGKey(0), x, train=False)
    assert "res3h" in ends


def test_image_prep():
    rng = np.random.RandomState(0)
    img = rng.randint(0, 255, (100, 120, 3), np.uint8)
    ev = eval_image(img, 64, 64)
    assert ev.shape == (64, 64, 3)
    di = distort_image(img, 64, 64, rng=np.random.RandomState(1))
    assert di.shape == (64, 64, 3)
    norm = imagenet_normalize(img)
    assert -3 < norm.mean() < 3


def test_background_generator_and_parallel_map():
    gen = BackgroundGenerator(iter(range(10)), depth=2)
    assert list(gen) == list(range(10))
    assert parallel_map(_square, [1, 2, 3], n_workers=2) == [1, 4, 9]
    # error propagation
    def boom():
        yield 1
        raise ValueError("boom")

    gen = BackgroundGenerator(boom())
    import pytest

    with pytest.raises(ValueError):
        list(gen)


def _square(x):
    return x * x
