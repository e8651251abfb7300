"""A/B: fused Pallas edge-moments kernel vs the XLA gather/scatter path.

One EdgeConvM-equivalent neighbourhood-statistics layer (kNN build +
max/min/sum/sumsq over k neighbours), forward and forward+backward, at
the model's channel widths. The XLA side includes the kNN build (the
fused kernel absorbs it). Timing protocol: scanned chain + value fetch
(see bench.py).

Usage: python scripts/perf_edge_fused.py [C ...]
"""

import json
import sys

import jax
import jax.numpy as jnp
import numpy as np

from mlsp_tpu.utils.cache import enable

enable()

from mlsp_tpu.ops.knn import knn_gather, knn_indices  # noqa: E402
from mlsp_tpu.ops.pallas.edge_pallas import edge_moments  # noqa: E402
from mlsp_tpu.utils.timing import timed_fetch  # noqa: E402

B, N, K, S = 32, 1024, 20, 8


def stats_xla(xg, u):
    idx = knn_indices(xg, K)
    g = knn_gather(u, idx)
    return (jnp.max(g, -2), jnp.min(g, -2), jnp.sum(g, -2),
            jnp.sum(g * g, -2))


def stats_fused(xg, u):
    return edge_moments(xg, u, K)


def run(C):
    rng = np.random.default_rng(0)
    xg = jnp.asarray(rng.standard_normal((B, N, C)), jnp.float32)
    u = jnp.asarray(rng.standard_normal((B, N, C)), jnp.float32)
    cot = jnp.asarray(rng.standard_normal((4, B, N, C)), jnp.float32)

    out = {"C": C}
    for name, stats in (("xla", stats_xla), ("fused", stats_fused)):
        def loss(u_, xg_, cot_):
            mx, mn, s1, s2 = stats(xg_, u_)
            return jnp.sum(mx * cot_[0] + mn * cot_[1] + s1 * cot_[2]
                           + s2 * cot_[3])

        gfn = jax.grad(loss)

        @jax.jit
        def fwd_chain(u, xg, cot):
            def body(c, _):
                return jnp.max(loss(u + c * 1e-9, xg, cot)) * 1e-9, ()

            c, _ = jax.lax.scan(body, jnp.float32(0.0), (), length=S)
            return c

        @jax.jit
        def bwd_chain(u, xg, cot):
            def body(c, _):
                g = gfn(u + c * 1e-9, xg, cot)
                return jnp.max(g) * 1e-9, ()

            c, _ = jax.lax.scan(body, jnp.float32(0.0), (), length=S)
            return c

        timed_fetch(fwd_chain, u, xg, cot, trials=1)
        out[f"{name}_fwd_ms"] = round(
            timed_fetch(fwd_chain, u, xg, cot) / S * 1e3, 2)
        timed_fetch(bwd_chain, u, xg, cot, trials=1)
        out[f"{name}_fwdbwd_ms"] = round(
            timed_fetch(bwd_chain, u, xg, cot) / S * 1e3, 2)
    out["speedup_fwdbwd"] = round(
        out["xla_fwdbwd_ms"] / out["fused_fwdbwd_ms"], 2)
    print(json.dumps(out))


if __name__ == "__main__":
    for C in [int(a) for a in sys.argv[1:]] or (64, 128, 256):
        run(C)
