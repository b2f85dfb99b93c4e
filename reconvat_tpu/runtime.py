"""Runtime setup: persistent compilation cache, platform selection."""
from __future__ import annotations

import os


def setup(cache_dir: str | None = None):
    """Enable the persistent XLA compilation cache (compiles on this host
    go through a remote-compile relay and are slow; the cache makes every
    subsequent process start fast)."""
    import jax

    cache = cache_dir or os.environ.get(
        "RECONVAT_JAX_CACHE",
        os.path.join(os.path.expanduser("~"), ".cache", "reconvat_jax"))
    os.makedirs(cache, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    try:
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except AttributeError:
        pass
    return cache
