"""Learning-rate schedule matching the reference optimizer.

tf.train.exponential_decay(lr, step, decay_steps, decay_rate, staircase=True)
(myutils.py:214-222) with defaults lr=1e-4, decay 0.5 every 250k steps
(train.py:34-38).
"""

from __future__ import annotations

import optax


def staircase_decay(base_lr: float = 1e-4, decay_rate: float = 0.5,
                    decay_steps: int = 250000):
    return optax.exponential_decay(
        init_value=base_lr,
        transition_steps=decay_steps,
        decay_rate=decay_rate,
        staircase=True,
    )


def make_optimizer(base_lr: float = 1e-4, decay_rate: float = 0.5,
                   decay_steps: int = 250000, clip_norm: float | None = None):
    """Adam with the staircase schedule (TF AdamOptimizer defaults:
    b1=0.9, b2=0.999, eps=1e-8); optional global-norm gradient clipping
    (the reference harness's clipping knob, dnn.py:487-491)."""
    tx = optax.adam(staircase_decay(base_lr, decay_rate, decay_steps),
                    b1=0.9, b2=0.999, eps=1e-8)
    if clip_norm is not None:
        tx = optax.chain(optax.clip_by_global_norm(clip_norm), tx)
    return tx
