"""Persistent XLA compilation cache.

First compilation of the deploy program takes minutes (the 500-slice
conv graph); enabling JAX's persistent cache makes every later process
reuse the compiled executable.  Called by bench.py and the deploy CLIs.
"""

from __future__ import annotations

import os

_DEFAULT_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), ".jax_cache")


def enable_compilation_cache(cache_dir: str | None = None) -> bool:
    """Enable the persistent compilation cache; returns success."""
    import jax

    try:
        jax.config.update("jax_compilation_cache_dir",
                          cache_dir or _DEFAULT_DIR)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
        return True
    except Exception:
        return False
