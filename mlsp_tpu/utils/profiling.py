"""Tracing/profiling helpers.

The reference's entire observability story is a commented-out
`log_execution_time` decorator (`PointDA/trainer.py:145-157`); here it
is live, plus a JAX device-profiler context that captures an XLA trace
viewable in TensorBoard/Perfetto.
"""

from __future__ import annotations

import contextlib
import functools
import time


def log_execution_time(func):
    """Wall-time decorator (reference parity)."""

    @functools.wraps(func)
    def wrapper(*args, **kwargs):
        start = time.perf_counter()
        res = func(*args, **kwargs)
        print("[%s] took %.2f s" % (func.__name__, time.perf_counter() - start))
        return res

    return wrapper


@contextlib.contextmanager
def device_trace(logdir: str = "/tmp/mlsp_trace"):
    """Capture an XLA/TPU profiler trace around a block."""
    import jax

    jax.profiler.start_trace(logdir)
    try:
        yield logdir
    finally:
        jax.profiler.stop_trace()


class Timer:
    """Chained-dispatch-aware step timer: call `tick()` after
    `block_until_ready` points to get honest step latencies."""

    def __init__(self):
        self.t = time.perf_counter()
        self.laps: list[float] = []

    def tick(self) -> float:
        now = time.perf_counter()
        lap = now - self.t
        self.t = now
        self.laps.append(lap)
        return lap
