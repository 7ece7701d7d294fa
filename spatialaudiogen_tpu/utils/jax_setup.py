"""Process-level JAX configuration shared by the CLIs.

TPU graph compiles are expensive (minutes through a tunneled backend);
JAX's persistent compilation cache makes reruns of the same entry point
start in seconds. Every CLI calls `enable_compile_cache()` before building
a model so users get this by default — the reference has no analogue
(TF1 sessions rebuilt their graph every run).
"""

from __future__ import annotations

import os

_DEFAULT_CACHE = os.path.expanduser("~/.cache/spatialaudiogen_tpu/jax_cache")


def enable_compile_cache(cache_dir: str | None = None) -> str:
    """Point JAX's persistent compilation cache at `cache_dir`.

    Resolution order: explicit argument, $SAG_JAX_CACHE, then a per-user
    default. Safe to call more than once; returns the directory used.
    """
    import jax

    cache_dir = cache_dir or os.environ.get("SAG_JAX_CACHE") or _DEFAULT_CACHE
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    return cache_dir
