"""Classification metrics (parity with pyutils/tflib/wrappers/metrics.py)."""

from __future__ import annotations

import jax.numpy as jnp


def accuracy(logits, labels):
    """Mean top-1 accuracy; labels may be class ids or one-hot."""
    if labels.ndim == logits.ndim:
        labels = jnp.argmax(labels, axis=-1)
    return jnp.mean(jnp.argmax(logits, axis=-1) == labels)


def top_k_accuracy(logits, labels, k: int = 5):
    if labels.ndim == logits.ndim:
        labels = jnp.argmax(labels, axis=-1)
    topk = jnp.argsort(logits, axis=-1)[..., -k:]
    return jnp.mean(jnp.any(topk == labels[..., None], axis=-1))
