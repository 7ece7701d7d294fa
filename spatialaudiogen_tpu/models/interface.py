"""Model interface protocol (parity with tflib/models/custom_models.py).

Any model usable by the generic harness/trainer exposes inference, loss and
evaluation entry points; SptAudioGen + models.metrics satisfy it.
"""

from __future__ import annotations

from typing import Protocol, runtime_checkable


@runtime_checkable
class GenerativeAudioModel(Protocol):
    def apply(self, variables, *inputs, train: bool = False, **kw):
        """Forward pass (flax Module.apply signature)."""

    @property
    def cfg(self):
        """Model configuration (geometry + architecture)."""
