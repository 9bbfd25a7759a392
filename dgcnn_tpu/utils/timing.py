"""Timing / profiling helpers (reference prints wall-clock per iteration
at report steps [M per SURVEY.md §5]; `--profile_dir` adds jax.profiler
traces)."""

from __future__ import annotations

import contextlib
import time


class Timer:
    """Accumulating wall-clock timer: ``with timer.measure(): ...``."""

    def __init__(self):
        self.total = 0.0
        self.count = 0

    @contextlib.contextmanager
    def measure(self):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.total += time.perf_counter() - t0
            self.count += 1

    @property
    def mean(self) -> float:
        return self.total / max(self.count, 1)


@contextlib.contextmanager
def trace(profile_dir: str | None):
    """jax.profiler trace scope; no-op when dir is empty."""
    if not profile_dir:
        yield
        return
    import jax

    with jax.profiler.trace(profile_dir):
        yield


def device_memory_stats() -> dict:
    """Best-effort live/peak HBM bytes of device 0 (empty off-TPU)."""
    import jax

    try:
        stats = jax.local_devices()[0].memory_stats() or {}
    except Exception:
        return {}
    keep = ("bytes_in_use", "peak_bytes_in_use", "bytes_limit")
    return {k: int(v) for k, v in stats.items() if k in keep}
