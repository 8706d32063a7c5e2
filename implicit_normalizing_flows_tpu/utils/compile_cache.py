"""Persistent XLA compilation cache.

Remote compiles through the TPU tunnel cost seconds-to-minutes per unique
program; the solver/power-iteration programs are shape-stable across runs, so
a persistent cache makes every run after the first start in seconds.
"""
from __future__ import annotations

import os


def enable_compilation_cache(path: str | None = None):
    import jax

    # CPU AOT cache entries embed host machine features and can SIGILL when
    # loaded on a different host; only cache for accelerator backends.
    try:
        if jax.default_backend() == "cpu":
            return None
    except Exception:
        return None
    path = path or os.environ.get(
        "IMNF_COMPILE_CACHE", os.path.expanduser("~/.cache/imnf_tpu_xla")
    )
    os.makedirs(path, exist_ok=True)
    try:
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    except Exception:
        pass  # older jax without these flags
    return path
