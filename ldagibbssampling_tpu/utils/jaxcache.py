"""Persistent XLA compilation cache setup.

The reference has no compilation step; here every sweep shape compiles once
per process.  On this hardware the K=500 production shapes take minutes to
compile (remote Mosaic/XLA compile), so all device-touching entry points
(``ops``, ``bench.py``, the CLI) route through :func:`enable_compilation_cache`
to persist compiled executables across processes.

Idempotent; honors an explicit ``JAX_COMPILATION_CACHE_DIR`` env override and
degrades silently if the cache cannot be configured (e.g. read-only home).
"""

from __future__ import annotations

import os

_DEFAULT_DIR = os.path.expanduser("~/.cache/jax_lda_tpu")
_done = False


def enable_compilation_cache() -> None:
    global _done
    if _done:
        return
    _done = True
    try:
        import jax

        if jax.config.jax_compilation_cache_dir:  # already configured
            return
        cache_dir = os.environ.get("JAX_COMPILATION_CACHE_DIR", _DEFAULT_DIR)
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        # cache everything that took noticeable compile time
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:  # pragma: no cover - cache is best-effort
        pass
