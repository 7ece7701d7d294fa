"""Test configuration: force an 8-device virtual CPU mesh before JAX loads.

Multi-device sharding paths are exercised on CPU via
--xla_force_host_platform_device_count (no TPU needed in CI).
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"  # hard override: host env pins a TPU platform
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")

import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# The axon TPU plugin ignores the JAX_PLATFORMS env var; force via config.
import jax

jax.config.update("jax_platforms", "cpu")
assert jax.devices()[0].platform == "cpu"
assert len(jax.devices()) == 8, "expected 8 virtual CPU devices for mesh tests"
