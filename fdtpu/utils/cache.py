"""Persistent XLA compilation cache.

Compiles routed through this image's remote TPU compile service cost minutes
for the larger training programs; the persistent cache makes them one-time
per (program, shape). Entry scripts, bench.py and __graft_entry__ call this
at startup; library code never does (no import side effects).
"""

from __future__ import annotations

import os


def enable_compilation_cache(path: str | None = None) -> str:
    import jax

    path = path or os.environ.get(
        "FDTPU_COMPILATION_CACHE", os.path.expanduser("~/.cache/fdtpu_xla")
    )
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    return path
