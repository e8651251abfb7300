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


def shape_rows(shape: str) -> int:
    """ROW count of an HLO shape string "d0,d1,...,dn": the product of
    all dims but the last (the sparse-op cost unit). "?" (an operand the
    definition table could not resolve) counts 0 but stays visible in
    the census."""
    if shape == "?":
        return 0
    dims = [int(d) for d in shape.split(",")]
    if len(dims) > 1:
        rows = 1
        for d in dims[:-1]:
            rows *= d
        return rows
    return dims[0]


def hlo_sparse_census(hlo: str):
    """Census of every gather/scatter in an optimized HLO dump.

    The sparse-op cost model on TPU is ROWS/s (flat in channel width to
    C~256 — see CLAUDE.md): a gather's cost rows are its OUTPUT rows
    (prod of all dims but the last), a scatter's are its UPDATES-operand
    rows (operand 2) — NOT the output buffer shape — resolved through a
    definition table because optimized HLO names operands without
    inline shapes.

    Returns ``(gather_rows, scatter_rows, gather_census,
    scatter_census)`` where the censuses map shape-string -> op count.
    Pure text analysis (unit-tested in tests/test_bench_projection.py);
    used by bench.py's seg-step account and
    scripts/profile_seg_step.py.
    """
    import re
    from collections import Counter

    gathers, scatters = Counter(), Counter()
    for m in re.finditer(r"= \w+\[([\d,]+)\]\{[^}]*\} gather\(", hlo):
        gathers[m.group(1)] += 1
    defs = {m.group(1): m.group(2) for m in re.finditer(
        r"%([\w.-]+) = \w+\[([\d,]+)\]", hlo)}
    # A scatter's operand list is (T operands, 1 indices, T updates) —
    # T=1 ordinarily, T>1 for variadic (multi-result) scatters that XLA
    # forms when scatters share indices. Cost each UPDATES operand (the
    # trailing T), so variadic scatters are censused, not dropped.
    for m in re.finditer(r" scatter\((%[\w.-]+(?:, %[\w.-]+)*)\)", hlo):
        operands = [o.strip().lstrip("%") for o in m.group(1).split(",")]
        n_updates = (len(operands) - 1) // 2
        for upd in operands[len(operands) - n_updates:]:
            scatters[defs.get(upd, "?")] += 1

    g_rows = sum(shape_rows(s) * c for s, c in gathers.items())
    s_rows = sum(shape_rows(s) * c for s, c in scatters.items())
    return g_rows, s_rows, dict(gathers), dict(scatters)


def costing_gather_rows(gather_census: dict, min_rank: int = 3) -> int:
    """Row count of the gathers that PAY the standalone row rate.

    The raw census over-prices the step by ~20% on BOTH bench
    workloads: each EdgeConvM backward materializes, besides its
    scatter, a FLAT rank-2 ``[B*N*k, C]`` re-gather that XLA fuses into
    the surrounding computation (measured round 5: the flat-gather op
    count equals the scatter count on both the PointDA and seg steps,
    and pricing them at the microbenched row rate puts the "bound"
    above the measured step). The batched rank>=3 ``[B, N, k, C]``
    forms are the ops the round-2/3 per-op profile showed actually
    paying per-row cost (10 gathers + 8 scatters = the 18 measured
    sparse ops of the PointDA step). Filtering to rank >= ``min_rank``
    reproduces that validated count and makes the census-priced
    account close against the measured step (seg: 0.98 vs 1.23
    unfiltered).
    """
    return sum(shape_rows(s) * c for s, c in gather_census.items()
               if len(s.split(",")) >= min_rank)


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
