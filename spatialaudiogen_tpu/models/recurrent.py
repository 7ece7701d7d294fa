"""Recurrent layer wrappers (generic library surface).

Parity with pyutils/tflib/wrappers/recurrent.py (rnn/lstm/gru and their
bidirectional variants — unused by the SptAudioGen model but part of the
reference's NN library). TPU-idiomatic: cells scan under jax.lax.scan via
flax.linen.RNN, so sequences compile to a single fused loop.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp

CELL_TYPES = {
    "rnn": nn.SimpleCell,
    "lstm": nn.OptimizedLSTMCell,
    "gru": nn.GRUCell,
}


class Recurrent(nn.Module):
    """Unidirectional RNN over (B, T, F) -> (B, T, units) [+ final state]."""

    units: int
    cell_type: str = "lstm"
    return_state: bool = False
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        cell = CELL_TYPES[self.cell_type](features=self.units, dtype=self.dtype,
                                          name="cell")
        rnn = nn.RNN(cell, return_carry=self.return_state, name="rnn")
        out = rnn(x)
        return out


class BidirectionalRecurrent(nn.Module):
    """Forward + time-reversed passes concatenated on features
    (recurrent.py bidirectional_* parity)."""

    units: int
    cell_type: str = "lstm"
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        fwd = Recurrent(self.units, self.cell_type, dtype=self.dtype, name="fw")(x)
        bwd = Recurrent(self.units, self.cell_type, dtype=self.dtype,
                        name="bw")(jnp.flip(x, axis=1))
        return jnp.concatenate([fwd, jnp.flip(bwd, axis=1)], axis=-1)


def rnn(x, units, **kw):
    return Recurrent(units, "rnn", **kw)(x)


def lstm(x, units, **kw):
    return Recurrent(units, "lstm", **kw)(x)


def gru(x, units, **kw):
    return Recurrent(units, "gru", **kw)(x)
