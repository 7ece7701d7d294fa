"""Train state container and sharded initialization."""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import struct

from spatialaudiogen_tpu.models import SptAudioGen


class TrainState(struct.PyTreeNode):
    step: jnp.ndarray
    params: Any
    batch_stats: Any
    opt_state: Any


def init_variables(model: SptAudioGen, rng, batch: dict):
    """Initialize model variables from a (possibly host-side) example batch."""
    cfg = model.cfg
    g = cfg.geometry
    audio = jnp.zeros((1, g.snd_size, g.num_in_channels), jnp.float32)
    video = flow = None
    if "video" in cfg.encoders:
        video = jnp.zeros((1,) + tuple(batch["video"].shape[1:]), jnp.float32)
    if "flow" in cfg.encoders:
        flow = jnp.zeros((1,) + tuple(batch["flow"].shape[1:]), jnp.float32)
    return model.init(rng, audio, video, flow, train=False)


def create_train_state(model: SptAudioGen, tx, rng, batch: dict) -> TrainState:
    variables = init_variables(model, rng, batch)
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    return TrainState(step=jnp.zeros((), jnp.int32), params=params,
                      batch_stats=batch_stats, opt_state=tx.init(params))
