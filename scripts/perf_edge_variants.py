"""Isolate the EdgeConvM sparse core and race lowering variants on TPU.

The per-op trace (scripts/profile_ops.py) shows the train step spends
~75 ms/step in backward scatter-adds (at ~65M rows/s, 4x slower than the
all-ones-cotangent microbench suggested) plus ~70 ms of layout churn
around the [B, N, k, C] edge tensors. This script measures, per channel
width:

  raw      — gather fwd only (row-rate reference)
  scat0    — scatter-add of a RANDOM cotangent (honest scatter rate)
  scatS    — same scatter with pre-sorted indices (indices_are_sorted)
  v0       — current core: take_along_axis + 4 reductions, jax.grad
  v1       — flat-gather formulation + reshape, jax.grad
  v2       — flat gather + reduce_window (never builds [B,N,k,C]), jax.grad

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/perf_edge_variants.py
"""

import json

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from mlsp_tpu.utils.cache import enable as enable_cache
from mlsp_tpu.utils.timing import timed_scan

B, N, k, S = 32, 1024, 20, 16


def flat_gather(u, fidx, C):
    uf = u.reshape(B * N, C)
    return uf[fidx]  # [B*N*k, C]


def core_v0(u, idx, w):
    g = jnp.take_along_axis(u[:, :, None, :], idx[..., None], axis=1)
    mx = jnp.max(g, axis=-2)
    mn = jnp.min(g, axis=-2)
    s1 = jnp.mean(g, axis=-2)
    s2 = jnp.mean(g * g, axis=-2)
    return jnp.sum(mx * w[0] + mn * w[1] + s1 * w[2] + s2 * w[3])


def core_v1(u, fidx, w, C):
    g = flat_gather(u, fidx, C).reshape(B, N, k, C)
    mx = jnp.max(g, axis=-2)
    mn = jnp.min(g, axis=-2)
    s1 = jnp.mean(g, axis=-2)
    s2 = jnp.mean(g * g, axis=-2)
    return jnp.sum(mx * w[0] + mn * w[1] + s1 * w[2] + s2 * w[3])


def _win(g, init, op):
    return lax.reduce_window(g, init, op, (k, 1), (k, 1), "VALID")


def core_v2(u, fidx, w, C):
    g = flat_gather(u, fidx, C)  # [B*N*k, C]
    mx = _win(g, -jnp.inf, lax.max).reshape(B, N, C)
    mn = _win(g, jnp.inf, lax.min).reshape(B, N, C)
    s1 = (_win(g, 0.0, lax.add) / k).reshape(B, N, C)
    s2 = (_win(g * g, 0.0, lax.add) / k).reshape(B, N, C)
    return jnp.sum(mx * w[0] + mn * w[1] + s1 * w[2] + s2 * w[3])


def main():
    enable_cache()
    rng = np.random.default_rng(0)
    out = {}
    from mlsp_tpu.ops.knn import knn_indices

    for C in (64, 256):
        pts = jnp.asarray(rng.standard_normal((S, B, N, 3)), jnp.float32)
        us = jnp.asarray(rng.standard_normal((S, B, N, C)), jnp.float32)
        ws = jnp.asarray(rng.standard_normal((S, 4, B, N, C)), jnp.float32)
        cots = jnp.asarray(rng.standard_normal((S, B * N * k, C)), jnp.float32)

        idx = jax.jit(lambda p: jax.vmap(lambda q: knn_indices(q[None], k)[0])(p))(pts)
        offs = (jnp.arange(B, dtype=jnp.int32) * N)[:, None, None]
        fidxs = (idx + offs).reshape(S, B * N * k)

        def raw(args, C=C):
            u, fidx = args
            return jnp.sum(flat_gather(u, fidx, C))

        out[f"C{C}_raw_gather"] = timed_scan(raw, (us, fidxs), S)

        def scat0(args, C=C):
            u, fidx, cot = args
            z = jnp.zeros((B * N, C), jnp.float32)
            return jnp.sum(z.at[fidx].add(cot) * u.reshape(B * N, C))

        out[f"C{C}_scatter_rand"] = timed_scan(scat0, (us, fidxs, cots), S)

        def scatS(args, C=C):
            u, fidx, cot = args
            sidx = jnp.sort(fidx)
            perm = jnp.argsort(fidx)
            z = jnp.zeros((B * N, C), jnp.float32)
            z = z.at[sidx].add(cot[perm], indices_are_sorted=True,
                               unique_indices=False)
            return jnp.sum(z * u.reshape(B * N, C))

        out[f"C{C}_scatter_sorted"] = timed_scan(scatS, (us, fidxs, cots), S)

        def g0(args, C=C):
            u, idx_, w = args
            return jnp.sum(jax.grad(core_v0)(u, idx_, w) ** 2)

        out[f"C{C}_v0_grad"] = timed_scan(g0, (us, idx, ws), S)

        def g2(args, C=C):
            # Manual fwd+bwd of the v2 core (select-and-scatter — the
            # autodiff path for windowed max — is unimplemented on TPU,
            # so build the edge cotangent by hand: same memory traffic).
            u, fidx, w = args
            g = flat_gather(u, fidx, C)
            mx = _win(g, -jnp.inf, lax.max)
            mn = _win(g, jnp.inf, lax.min)

            def bcast(x):  # [B*N, C] -> [B*N*k, C] group-broadcast
                return jnp.broadcast_to(
                    x.reshape(B * N, 1, C), (B * N, k, C)
                ).reshape(B * N * k, C)

            w0, w1, w2, w3 = (wi.reshape(B * N, C) for wi in w)
            cot = ((g == bcast(mx)) * bcast(w0)
                   + (g == bcast(mn)) * bcast(w1)
                   + bcast(w2) / k
                   + 2.0 * g * bcast(w3) / k)
            z = jnp.zeros((B * N, C), jnp.float32)
            ubar = z.at[fidx].add(cot)
            return jnp.sum(ubar**2) + jnp.sum(mx) + jnp.sum(mn)

        out[f"C{C}_v2_grad"] = timed_scan(g2, (us, fidxs, ws), S)

        print(json.dumps({n: round(v * 1e3, 3) for n, v in out.items()
                          if n.startswith(f"C{C}_")}))


if __name__ == "__main__" and not __import__("os").environ.get("V3"):
    main()


def main_v3():
    """[B, k, N, C] axis order: minor dims (N, C) tile cleanly (no k->24
    padding), k-reductions run over a major axis, and flat<->4D reshapes
    collapse only major dims (no retile copies)."""
    enable_cache()
    rng = np.random.default_rng(0)
    from mlsp_tpu.ops.knn import knn_indices

    for C in (64,):
        pts = jnp.asarray(rng.standard_normal((S, B, N, 3)), jnp.float32)
        us = jnp.asarray(rng.standard_normal((S, B, N, C)), jnp.float32)
        ws = jnp.asarray(rng.standard_normal((S, 4, B, N, C)), jnp.float32)
        cots = jnp.asarray(rng.standard_normal((S, B * N * k, C)), jnp.float32)
        idx = jax.jit(lambda p: jax.vmap(lambda q: knn_indices(q[None], k)[0])(p))(pts)
        offs = (jnp.arange(B, dtype=jnp.int32) * N)[:, None, None]
        # [S, B, k, N] edge-major flat indices
        fidx2s = (idx + offs).transpose(0, 1, 3, 2).reshape(S, B * k * N)

        def core_v3(u, fidx2, w, C=C):
            g = u.reshape(B * N, C)[fidx2].reshape(B, k, N, C)
            mx = jnp.max(g, axis=1)
            mn = jnp.min(g, axis=1)
            s1 = jnp.mean(g, axis=1)
            s2 = jnp.mean(g * g, axis=1)
            return jnp.sum(mx * w[0] + mn * w[1] + s1 * w[2] + s2 * w[3])

        def g3(args, C=C):
            u, fidx2, w = args
            return jnp.sum(jax.grad(core_v3)(u, fidx2, w) ** 2)

        r3 = timed_scan(g3, (us, fidx2s, ws), S)

        def scatP(args, C=C):
            u, fidx2, cot = args
            z = jnp.zeros((B * N, C), jnp.float32)
            return jnp.sum(z.at[fidx2].add(cot, mode="promise_in_bounds")
                           * u.reshape(B * N, C))

        rP = timed_scan(scatP, (us, fidx2s, cots), S)
        print(json.dumps({f"C{C}_v3_grad": round(r3 * 1e3, 3),
                          f"C{C}_scatter_promise": round(rP * 1e3, 3)}))


if __name__ == "__main__" and __import__("os").environ.get("V3"):
    main_v3()
