"""Attack the bench step's layout residual (~10-15%: reshape/copy/
transpose around the sparse ops, per scripts/attrib_step_trace.py).

Hypothesis: the batched `take_along_axis` gather ([B, M, 1, C] indexed
by [B, N, k, 1]) and its scatter adjoint make XLA materialize
batch-dim/layout conversions that a FLAT single-axis formulation
(row offsets precomputed, [B*M, C] table) would avoid; similarly the
backward might prefer an explicit sorted `segment_sum`.

Variants, each timed fwd+bwd at the flagship layer shape with the
bench's scan+fetch protocol (relay-safe):
  A baseline   — knn_gather (take_along_axis) + jnp reductions
  B flat       — one-axis gather on [B*M, C] with absolute row ids
  C flat+seg   — flat gather, custom_vjp backward via segment_sum on
                 the flat rows (num_segments=B*M)
  D flat+sort  — like C but rows pre-sorted by segment id once in the
                 forward (indices_are_sorted=True segment_sum)

Round-3 context (scripts/perf_edge_variants.py): [B,k,N,C] layouts,
sorted scatter, promise_in_bounds, reduce_window were all measured
no-ops; this probes the remaining degree of freedom — eliminating the
gather/scatter BATCH dimension entirely.

Run on the real chip: PYTHONPATH=.:$PYTHONPATH python scripts/perf_layout_tail.py
"""

import json
import sys

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from mlsp_tpu.ops.knn import knn_gather, knn_indices
    from mlsp_tpu.utils.cache import enable as enable_cache
    from mlsp_tpu.utils.timing import timed_fetch

    enable_cache()
    B, N, K, S = 32, 1024, 20, 8
    rng = np.random.default_rng(0)
    out = {}

    for C in (64, 256):
        x = jnp.asarray(rng.standard_normal((B, N, C)), jnp.float32)
        u = jnp.asarray(rng.standard_normal((B, N, C)), jnp.float32)
        cot = jnp.asarray(rng.standard_normal((4, B, N, C)), jnp.float32)
        idx = jax.jit(lambda x: knn_indices(x, K, backend="xla"))(x)
        flat_idx = (idx + (jnp.arange(B) * N)[:, None, None]).reshape(-1)

        def stats_of(g):  # the four EdgeConvM moments
            return (jnp.max(g, -2), jnp.min(g, -2),
                    jnp.sum(g, -2), jnp.sum(g * g, -2))

        def var_a(u_, idx_, cot_):
            g = knn_gather(u_, idx_)  # [B, N, k, C]
            mx, mn, s1, s2 = stats_of(g)
            return jnp.sum(mx * cot_[0] + mn * cot_[1] + s1 * cot_[2]
                           + s2 * cot_[3])

        def var_b(u_, fidx_, cot_):
            g = u_.reshape(B * N, C)[fidx_].reshape(B, N, K, C)
            mx, mn, s1, s2 = stats_of(g)
            return jnp.sum(mx * cot_[0] + mn * cot_[1] + s1 * cot_[2]
                           + s2 * cot_[3])

        @jax.custom_vjp
        def flat_gather_seg(uf, fidx_):
            return uf[fidx_]

        def _fg_fwd(uf, fidx_):
            return uf[fidx_], (fidx_, uf.shape[0])

        def _fg_bwd(res, ct):
            fidx_, m = res
            return (jax.ops.segment_sum(ct, fidx_, num_segments=m), None)

        flat_gather_seg.defvjp(_fg_fwd, _fg_bwd)

        def var_c(u_, fidx_, cot_):
            g = flat_gather_seg(u_.reshape(B * N, C), fidx_)
            mx, mn, s1, s2 = stats_of(g.reshape(B, N, K, C))
            return jnp.sum(mx * cot_[0] + mn * cot_[1] + s1 * cot_[2]
                           + s2 * cot_[3])

        # D: rows pre-sorted by destination segment (one argsort, reused)
        order = jnp.argsort(flat_idx)
        sorted_idx = flat_idx[order]
        inv = jnp.argsort(order)  # scatter-back permutation (layout only)

        @jax.custom_vjp
        def flat_gather_sorted(uf, sidx, inv_):
            return uf[sidx][inv_]

        def _fgs_fwd(uf, sidx, inv_):
            return uf[sidx][inv_], (sidx, inv_, uf.shape[0])

        def _fgs_bwd(res, ct):
            sidx, inv_, m = res
            ct_sorted = ct[jnp.argsort(inv_)]  # back to sorted-row order
            return (jax.ops.segment_sum(ct_sorted, sidx, num_segments=m,
                                        indices_are_sorted=True),
                    None, None)

        flat_gather_sorted.defvjp(_fgs_fwd, _fgs_bwd)

        # sorted_idx/inv ride in as ONE stacked argument — big arrays
        # must never be closed over a jit (CLAUDE.md: closed-over
        # constants bake into the HLO and can 413 the remote compiler)
        d_idx = jnp.stack([sorted_idx, inv])

        def var_d(u_, didx_, cot_):
            g = flat_gather_sorted(u_.reshape(B * N, C), didx_[0], didx_[1])
            mx, mn, s1, s2 = stats_of(g.reshape(B, N, K, C))
            return jnp.sum(mx * cot_[0] + mn * cot_[1] + s1 * cot_[2]
                           + s2 * cot_[3])

        variants = {"A_take_along": (var_a, idx),
                    "B_flat": (var_b, flat_idx),
                    "C_flat_segsum": (var_c, flat_idx),
                    "D_flat_sorted": (var_d, d_idx)}
        for name, (fn, i_) in variants.items():
            gfn = jax.grad(fn)

            @jax.jit
            def chain(u, i__, cot, gfn=gfn):
                def body(c, _):
                    return jnp.max(gfn(u + c * 1e-9, i__, cot)) * 1e-9, ()

                c, _ = jax.lax.scan(body, jnp.float32(0.0), (), length=S)
                return c

            # numerics check vs baseline (fwd+bwd must agree)
            ga = jax.jit(jax.grad(var_a))(u, idx, cot)
            gv = jax.jit(gfn)(u, i_, cot)
            np.testing.assert_allclose(np.asarray(gv), np.asarray(ga),
                                       rtol=2e-4, atol=2e-4)
            timed_fetch(chain, u, i_, cot, trials=1)  # compile + warm
            ms = timed_fetch(chain, u, i_, cot) / S * 1e3
            out[f"{name}_C{C}_ms"] = round(ms, 2)
            print(f"{name} C={C}: {ms:.2f} ms", flush=True)

    print(json.dumps(out))


if __name__ == "__main__":
    sys.exit(main())
