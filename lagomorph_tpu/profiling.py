"""Profiling and timing utilities.

The reference has no tracing/profiling subsystem (SURVEY.md §5); here we
expose the JAX profiler plus honest device-timing helpers (block_until_ready
timing with warmup, suitable for the XLA async dispatch model).
"""
from __future__ import annotations

import contextlib
import time

import jax

__all__ = ["trace", "device_time", "Timer"]


@contextlib.contextmanager
def trace(logdir: str):
    """Capture a JAX/XLA profiler trace viewable in TensorBoard/Perfetto:

    >>> with lagomorph_tpu.profiling.trace("/tmp/trace"):
    ...     step(...)
    """
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def device_time(fn, *args, warmup: int = 1, iters: int = 3, **kwargs):
    """Median wall time of ``fn(*args)`` with compile warmup and
    block_until_ready around each call (seconds)."""
    for _ in range(max(warmup, 1)):
        out = fn(*args, **kwargs)
        jax.block_until_ready(out)
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        out = fn(*args, **kwargs)
        jax.block_until_ready(out)
        times.append(time.perf_counter() - t0)
    times.sort()
    return times[len(times) // 2]


class Timer:
    """Accumulating section timer for training loops.

    >>> t = Timer()
    >>> with t("data"):
    ...     batch = next(loader)
    >>> with t("step"):
    ...     out = step(batch); jax.block_until_ready(out)
    >>> t.summary()
    """

    def __init__(self):
        self.totals = {}
        self.counts = {}

    @contextlib.contextmanager
    def __call__(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            dt = time.perf_counter() - t0
            self.totals[name] = self.totals.get(name, 0.0) + dt
            self.counts[name] = self.counts.get(name, 0) + 1

    def summary(self):
        return {
            k: {"total_s": v, "count": self.counts[k], "mean_s": v / self.counts[k]}
            for k, v in self.totals.items()
        }
