"""Persistent XLA compilation cache.

Index builds and scoring kernels specialize on per-language static shapes;
cold compiles dominate small runs (especially with remote compilation).
Enabling the persistent cache makes every shape a one-time cost across
processes.
"""

from __future__ import annotations

import os


def enable(cache_dir: str | None = None) -> None:
    cache_dir = cache_dir or os.environ.get(
        "TDR_JAX_CACHE_DIR", os.path.join(os.path.expanduser("~"), ".cache", "tdr-jax"))
    os.makedirs(cache_dir, exist_ok=True)
    import jax

    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
