"""Generic training harness (the reference's dnn.py "framework" layer).

A model-agnostic fit/evaluate/predict loop over any Flax module and any
(features, labels) batch iterator — the equivalent of pyutils/tflib/dnn.py's
DNN/TrainOp/EvaluateOp (which the main CLIs bypass, as does our Trainer, but
it is part of the reference's library surface and is what quick experiments
use). Supports gradient clipping, LR schedules, and metric callbacks.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np
import optax


class GenericHarness:
    def __init__(self, model, loss_fn: Callable, metric_fns: dict | None = None,
                 optimizer=None, clip_norm: float | None = None, seed: int = 0):
        """loss_fn(logits, labels) -> scalar; metric_fns: name -> fn(logits, labels)."""
        self.model = model
        self.loss_fn = loss_fn
        self.metric_fns = metric_fns or {}
        tx = optimizer if optimizer is not None else optax.adam(1e-3)
        if clip_norm is not None:
            tx = optax.chain(optax.clip_by_global_norm(clip_norm), tx)
        self.tx = tx
        self.seed = seed
        self.params = None
        self.opt_state = None
        self._step = None

    def _init(self, features):
        self.params = self.model.init(jax.random.PRNGKey(self.seed),
                                      jnp.asarray(features[:1]))["params"]
        self.opt_state = self.tx.init(self.params)

        def step(params, opt_state, feats, labels):
            def loss(p):
                logits = self.model.apply({"params": p}, feats)
                return self.loss_fn(logits, labels), logits

            (value, logits), grads = jax.value_and_grad(loss, has_aux=True)(params)
            updates, opt_state = self.tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            metrics = {"loss": value}
            for name, fn in self.metric_fns.items():
                metrics[name] = fn(logits, labels)
            return params, opt_state, metrics

        self._step = jax.jit(step)

    def fit(self, batches, epochs: int = 1, log_every: int = 0):
        """batches: iterable (or callable returning one) of (features, labels)."""
        history = []
        for epoch in range(epochs):
            it = batches() if callable(batches) else batches
            for i, (feats, labels) in enumerate(it):
                if self.params is None:
                    self._init(feats)
                self.params, self.opt_state, metrics = self._step(
                    self.params, self.opt_state, jnp.asarray(feats), jnp.asarray(labels))
                if log_every and i % log_every == 0:
                    print(f"epoch {epoch} step {i}: " +
                          " ".join(f"{k}={float(v):.4f}" for k, v in metrics.items()))
            history.append({k: float(v) for k, v in metrics.items()})
        return history

    def evaluate(self, batches) -> dict:
        assert self.params is not None, "fit() first"
        totals: dict = {}
        n = 0
        apply = jax.jit(lambda p, x: self.model.apply({"params": p}, x))
        for feats, labels in (batches() if callable(batches) else batches):
            logits = apply(self.params, jnp.asarray(feats))
            b = feats.shape[0]
            totals["loss"] = totals.get("loss", 0) + float(
                self.loss_fn(logits, jnp.asarray(labels))) * b
            for name, fn in self.metric_fns.items():
                totals[name] = totals.get(name, 0) + float(fn(logits, jnp.asarray(labels))) * b
            n += b
        return {k: v / n for k, v in totals.items()}

    def predict(self, features) -> np.ndarray:
        assert self.params is not None, "fit() first"
        return np.asarray(self.model.apply({"params": self.params},
                                           jnp.asarray(features)))
