"""Embedding lookup layer (parity with pyutils/tflib/wrappers/embedding.py)."""

from __future__ import annotations

from typing import Any

import flax.linen as nn


class Embedding(nn.Module):
    vocab_size: int
    features: int
    dtype: Any = None

    @nn.compact
    def __call__(self, ids):
        return nn.Embed(self.vocab_size, self.features, dtype=self.dtype,
                        name="embedding")(ids)


def embedding(ids, vocab_size, features, **kw):
    return Embedding(vocab_size, features, **kw)(ids)
