"""Metric logging: stdout stat lines + JSONL metric stream.

Replaces the reference's TensorBoard scalar summaries + stdout stats
(train.py:157-163, myutils.py:8-26) with a dependency-free JSONL stream
(model_dir/metrics.jsonl) any dashboard can tail, plus the same style of
throughput print.
"""

from __future__ import annotations

import json
import os
import sys
import time
from collections import deque
from datetime import datetime


class MetricLogger:
    def __init__(self, model_dir: str, fname: str = "metrics.jsonl",
                 window: int = 20, tensorboard: bool = True):
        os.makedirs(model_dir, exist_ok=True)
        self.path = os.path.join(model_dir, fname)
        self._f = open(self.path, "a")
        self.durations: deque = deque(maxlen=window)
        self._tb = None
        if tensorboard:
            from spatialaudiogen_tpu.utils.tensorboard import TBEventWriter

            self._tb = TBEventWriter(model_dir)

    def tick(self, duration: float):
        self.durations.append(duration)

    def samples_per_sec(self, batch_size: int) -> float:
        if not self.durations:
            return 0.0
        return len(self.durations) * batch_size / sum(self.durations)

    def log(self, step: int, metrics: dict, batch_size: int, tag: str = "TRAIN"):
        values = {k: float(v) for k, v in metrics.items()}
        rec = {"step": step, "time": time.time(), "tag": tag, **values}
        self._f.write(json.dumps(rec) + "\n")
        self._f.flush()
        if self._tb is not None:
            for name, val in values.items():
                self._tb.add_scalar(name, val, step)
            self._tb.flush()
        sps = self.samples_per_sec(batch_size)
        ts = datetime.now()
        header = f"{ts}: {tag} | step {step}"
        if sps > 0:
            header += f" ({sps:.3f} samples/sec | {1.0 / sps:.3f} secs/sample)"
        print(header)
        for name, val in values.items():
            print(f"{ts}: {tag} | \t {name} {val:f}")
        sys.stdout.flush()

    def log_histograms(self, step: int, tree, prefix: str = "params"):
        """Per-leaf TensorBoard histograms of a (host-side) pytree — the
        reference's verbosity-gated variable histograms (dnn.py:692-709).
        No-op without a TB writer."""
        if self._tb is None:
            return
        import jax
        import numpy as np

        for path, leaf in jax.tree_util.tree_leaves_with_path(tree):
            name = "/".join(str(getattr(k, "key", k)) for k in path)
            self._tb.add_histogram(f"{prefix}/{name}", np.asarray(leaf), step)
        self._tb.flush()

    def close(self):
        self._f.close()
        if self._tb is not None:
            self._tb.close()
