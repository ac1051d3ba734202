"""Persistent XLA compilation cache.

First compiles of the full 50-step UNet scan take tens of minutes through a
remote-TPU tunnel; the persistent cache turns every later process start into
a fast deserialization. Call once at startup (bench.py / apps do).
"""
from __future__ import annotations

import os

DEFAULT_CACHE_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__)))), ".jax_cache")


def enable_compilation_cache(cache_dir: str | None = None,
                             min_compile_secs: float = 2.0) -> str:
    import jax

    cache_dir = cache_dir or os.environ.get("CONSISTENTID_JAX_CACHE",
                                            DEFAULT_CACHE_DIR)
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs",
                      min_compile_secs)
    return cache_dir
