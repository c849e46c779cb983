"""Persistent XLA compilation cache: first compiles of the fused engine step
take tens of seconds; cached recompiles are near-instant across processes.
Call early in every entry point (before the first jit execution)."""

from __future__ import annotations

import os


def enable_persistent_cache(directory: str | None = None):
    import jax
    d = directory or os.environ.get(
        "GENSEG_TPU_CACHE", os.path.join(os.path.expanduser("~"),
                                         ".cache", "genseg_tpu_xla"))
    os.makedirs(d, exist_ok=True)
    try:
        jax.config.update("jax_compilation_cache_dir", d)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass  # older jax without the flags
    return d
