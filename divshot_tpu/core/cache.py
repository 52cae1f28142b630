"""Persistent XLA compilation cache.

On the axon-tunneled TPU, compiles run on a remote service and scale
superlinearly with buffer sizes (measured: 20 s at 256K instance capacity,
66 s at 1M, 233 s at 2M for the forward render alone). The persistent cache
makes every (program, shapes) pair a one-time cost per machine — the
trainer CLI, bench.py, and the round driver all share it.
"""

from __future__ import annotations

import os

_DEFAULT_DIR = os.path.expanduser("~/.cache/jaxcache")


def enable_compile_cache(path: str | None = None) -> None:
    """Enable the on-disk XLA compile cache (idempotent; no-op if the
    DIVSHOT_NO_COMPILE_CACHE env var is set)."""
    if os.environ.get("DIVSHOT_NO_COMPILE_CACHE"):
        return
    import jax

    try:
        jax.config.update("jax_compilation_cache_dir",
                          path or _DEFAULT_DIR)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    except Exception:
        pass  # older jax without the knobs
