"""Micro-breakdown of the fused edge-moments kernel's forward phases.

Variants (all [B=32, N=1024] grids, TILE=128):
  sel       — distance matmul + k-step argmin selection loop only
  selT      — + the transposed-mask scratch build (per-iter [T]->lane)
  selT1     — mask built in [T, N] layout, ONE transpose to [N, T]
  full      — the production forward kernel (mask + matmuls + reduces)

Usage: python scripts/perf_edge_micro.py [C]
"""

import functools
import json
import sys

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from mlsp_tpu.utils.cache import enable

enable()

from mlsp_tpu.ops.pallas import edge_pallas as ep  # noqa: E402
from mlsp_tpu.utils.timing import timed_fetch  # noqa: E402

B, N, K, S, TILE = 32, 1024, 20, 8, 128


def _sel_kernel(xq_ref, xdb_ref, out_ref, *, k, c, mode):
    dist = ep._row_dists(xq_ref[0], xdb_ref[0])
    T, n = dist.shape
    col = jax.lax.broadcasted_iota(jnp.int32, (T, n), 1)

    if mode == "sel":
        def body(_, d):
            a = jnp.argmin(d, axis=-1).astype(jnp.int32)
            return jnp.where(col == a[:, None], jnp.inf, d)

        d = jax.lax.fori_loop(0, k, body, dist)
        out_ref[0] = d[:, :c]
    elif mode == "selT1":
        def body(_, carry):
            d, sel = carry
            a = jnp.argmin(d, axis=-1).astype(jnp.int32)
            hit = col == a[:, None]
            return jnp.where(hit, jnp.inf, d), jnp.where(hit, 1.0, sel)

        d, sel = jax.lax.fori_loop(
            0, k, body, (dist, jnp.zeros((T, n), jnp.float32)))
        selT = sel.T  # one [T, N] -> [N, T] transpose
        out_ref[0] = d[:, :c] + jnp.sum(selT) * 1e-20
    else:  # "selT": the per-iteration transposed build
        def run(selT_ref):
            ep._fill_selT(xq_ref[0], xdb_ref[0], k, selT_ref)
            out_ref[0] = jnp.zeros((T, c), jnp.float32) + jnp.sum(
                selT_ref[:]) * 1e-20

        pl.run_scoped(run, pltpu.VMEM((n, T), jnp.float32))


def sel_variant(x, c, mode):
    return pl.pallas_call(
        functools.partial(_sel_kernel, k=K, c=c, mode=mode),
        out_shape=jax.ShapeDtypeStruct((B, N, c), jnp.float32),
        grid=(B, N // TILE),
        in_specs=[
            pl.BlockSpec((1, TILE, c), lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, N, c), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, TILE, c), lambda b, i: (b, i, 0),
                               memory_space=pltpu.VMEM),
    )(x, x)


def main(C):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((B, N, C)), jnp.float32)
    u = jnp.asarray(rng.standard_normal((B, N, C)), jnp.float32)
    out = {"C": C}

    for mode in ("sel", "selT", "selT1"):
        @jax.jit
        def chain(x):
            def body(cc, _):
                r = sel_variant(x + cc * 1e-9, C, mode)
                return jnp.max(r) * 1e-9, ()

            cc, _ = jax.lax.scan(body, jnp.float32(0.0), (), length=S)
            return cc

        timed_fetch(chain, x, trials=1)
        out[f"{mode}_ms"] = round(timed_fetch(chain, x) / S * 1e3, 2)

    @jax.jit
    def full(x, u):
        def body(cc, _):
            outs = ep.edge_moments(x + cc * 1e-9, u, K)
            return jnp.max(outs[0]) * 1e-9, ()

        cc, _ = jax.lax.scan(body, jnp.float32(0.0), (), length=S)
        return cc

    timed_fetch(full, x, u, trials=1)
    out["full_ms"] = round(timed_fetch(full, x, u) / S * 1e3, 2)
    print(json.dumps(out))


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 64)
