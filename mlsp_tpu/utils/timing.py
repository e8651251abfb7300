"""Relay-safe device timing helpers.

Through the remote-TPU relay in this environment, `block_until_ready`
returns before execution completes, so the ONLY trustworthy wall time
ends in a forced value fetch (`float(x)`), ideally wrapping a
`lax.scan` of many iterations to amortise dispatch. This module is the
single implementation of that protocol (bench.py and the scripts/
profilers all use it).
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp


def timed_fetch(fn, *args, trials: int = 3) -> float:
    """Best wall time of `fn(*args)` ending in a forced value fetch."""
    best = float("inf")
    for _ in range(trials):
        t0 = time.perf_counter()
        out = fn(*args)
        float(out)  # forced fetch = true completion through the relay
        best = min(best, time.perf_counter() - t0)
    return best


def timed_scan(fn, xs, S: int, trials: int = 3) -> float:
    """Seconds per iteration of `fn` over the leading axis of `xs`,
    run as ONE scanned device program (compile+warm excluded)."""

    @jax.jit
    def run(xs):
        def body(c, x):
            return c + fn(x), ()

        c, _ = jax.lax.scan(body, jnp.float32(0.0), xs)
        return c

    float(run(xs))  # compile + warm
    return timed_fetch(run, xs, trials=trials) / S
