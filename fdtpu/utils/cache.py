"""Persistent XLA compilation cache.

Compiles routed through this image's remote TPU compile service cost minutes
for the larger training programs; the persistent cache makes them one-time
per (program, shape). Entry scripts, bench.py and __graft_entry__ call this
at startup; library code never does (no import side effects).
"""

from __future__ import annotations

import hashlib
import os
import platform


def host_fingerprint() -> str:
    """Short stable id for this host's executable-code compatibility.

    XLA's persistent cache does NOT key CPU-backend entries by the host's
    CPU features, so an entry written on one machine can replay on another
    and SIGILL (observed as a full-page warning in the round-4 driver
    artifact, MULTICHIP_r04.json). Key the cache *directory* by
    ``platform.machine()`` + a hash of the CPU feature flags so entries
    never cross hosts with different instruction sets.
    """
    feats = ""
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith(("flags", "Features")):
                    feats = " ".join(sorted(line.split(":", 1)[1].split()))
                    break
    except OSError:
        feats = platform.processor()
    digest = hashlib.sha1(feats.encode()).hexdigest()[:10]
    return f"{platform.machine()}-{digest}"


def enable_compilation_cache(path: str | None = None) -> str:
    import jax

    path = path or os.environ.get("FDTPU_COMPILATION_CACHE")
    if path is None:
        path = os.path.expanduser(
            os.path.join("~/.cache", f"fdtpu_xla_{host_fingerprint()}")
        )
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    return path
