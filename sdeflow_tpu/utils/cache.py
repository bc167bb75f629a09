"""Persistent XLA compilation cache.

Remote-TPU compiles cost tens of seconds per program through the tunnel's
compile helper; enabling jax's persistent cache makes every repeated
program (bench, presets, tests re-runs) load instantly across processes.
"""

from __future__ import annotations

import os

import jax

def enable_compilation_cache(cache_dir: str | None = None) -> str | None:
    """Turn on the persistent compilation cache (idempotent). The env var is
    read at call time so it can be set after importing the package.

    TPU-only: the win is the tens-of-seconds remote compile; XLA:CPU AOT
    artifacts are host-feature-specific and reloading them across machines
    (or differently-configured processes) risks SIGILL, so CPU runs skip
    the cache. Returns the cache dir, or None when skipped."""
    if jax.default_backend() != "tpu":
        return None
    cache_dir = cache_dir or os.environ.get(
        "SDEFLOW_JAX_CACHE", os.path.expanduser("~/.cache/sdeflow_tpu_xla")
    )
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    return cache_dir
