"""Persistent XLA compilation cache.

Remote-TPU compiles cost 20 s – minutes per program shape in this
environment; caching compiled executables on disk makes every entry point
(bench, CLI, container) fast after first use.
"""

from __future__ import annotations

import os
from pathlib import Path


def enable_compilation_cache(cache_dir=None) -> None:
    # kill switch: jax's executable serializer has segfaulted writing cache
    # entries on the CPU backend (pjit executables, observed twice under
    # pytest 2026-08-18 — once racing another writer, once solo).  CPU
    # compiles are cheap; the cache only pays for remote-TPU compiles.
    if os.environ.get("ATT_ASPP_DISABLE_COMPILE_CACHE"):
        return
    import jax

    d = Path(cache_dir or os.environ.get("JAX_CACHE_DIR",
                                         Path.home() / ".cache/jax_compilation"))
    d.mkdir(parents=True, exist_ok=True)
    try:
        jax.config.update("jax_compilation_cache_dir", str(d))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass  # older jax without the knobs — harmless
