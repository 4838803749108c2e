"""Persistent XLA compilation cache.

TPU compiles of the full-size models take minutes (single-core host +
remote compile); caching compiled executables on disk makes every rerun —
including the benchmark harness — start hot.  Called by all CLIs before
the first jit.
"""

from __future__ import annotations

import os

__all__ = ["enable_compilation_cache"]

_DEFAULT_DIR = os.path.expanduser("~/.cache/slice3d_tpu_xla")


def enable_compilation_cache(cache_dir: str | None = None) -> str:
    import jax

    path = cache_dir or os.environ.get("SLICE3D_XLA_CACHE", _DEFAULT_DIR)
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    return path
