"""Persistent XLA compilation cache.

Remote-TPU compiles cost tens of seconds per program through the tunnel's
compile helper; enabling jax's persistent cache makes every repeated
program (bench, presets, tests re-runs) load instantly across processes.
"""

from __future__ import annotations

import os

import jax

DEFAULT_CACHE_DIR = os.environ.get(
    "SDEFLOW_JAX_CACHE", os.path.expanduser("~/.cache/sdeflow_tpu_xla")
)


def enable_compilation_cache(cache_dir: str | None = None) -> str:
    """Turn on the persistent compilation cache (idempotent)."""
    cache_dir = cache_dir or DEFAULT_CACHE_DIR
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    return cache_dir
