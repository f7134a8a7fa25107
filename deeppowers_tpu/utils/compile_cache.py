"""Persistent XLA compilation cache helper (shared by serving + bench)."""

from __future__ import annotations

import os


def enable_compile_cache(cache_dir: str | None = None,
                         min_compile_secs: float = 0.5) -> str:
    """Point JAX's persistent compilation cache at a shared directory so
    warm restarts (servers, benches, repeat scripts) load compiled programs
    from disk instead of re-running XLA. Returns the directory used."""
    import jax

    cache_dir = cache_dir or os.path.join(
        os.path.expanduser("~"), ".cache", "deeppowers_tpu", "xla_cache")
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs",
                      min_compile_secs)
    return cache_dir
