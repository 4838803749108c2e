"""Profiling/observability helpers (SURVEY §5: per-stage timers preserved
in a stats dict + jax.profiler traces).
"""

from __future__ import annotations

import contextlib
import time
from typing import Dict, Iterator, Optional

import jax

__all__ = ["StageTimer", "trace", "device_memory_stats"]


class StageTimer:
    """Accumulates wall times per named stage into a stats dict."""

    def __init__(self, stats: Optional[Dict] = None):
        self.stats: Dict = stats if stats is not None else {}

    @contextlib.contextmanager
    def stage(self, name: str) -> Iterator[None]:
        t0 = time.perf_counter()
        try:
            yield
        finally:
            key = f"time_{name}"
            self.stats[key] = self.stats.get(key, 0.0) + time.perf_counter() - t0


def device_memory_stats() -> Dict:
    """Peak/current device memory (role of the reference CUDACallback's
    per-epoch peak-memory log, gen_slices/main.py:402-422)."""
    try:
        stats = jax.local_devices()[0].memory_stats() or {}
    except Exception:
        return {}
    out = {}
    for key in ("bytes_in_use", "peak_bytes_in_use", "bytes_limit"):
        if key in stats:
            out[key.replace("bytes", "mb")] = round(stats[key] / 2 ** 20, 1)
    return out


@contextlib.contextmanager
def trace(logdir: Optional[str]) -> Iterator[None]:
    """jax.profiler trace context; no-op when logdir is None."""
    if not logdir:
        yield
        return
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
