"""Pallas kernel tests (interpret mode on the CPU test mesh; real-TPU
correctness/perf are exercised by bench.py and the verify recipe)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mlsp_tpu.ops.knn import knn_indices
from mlsp_tpu.ops.pallas.knn_pallas import knn_pallas


class TestKnnPallas:
    @pytest.mark.parametrize("C", [3, 8])
    def test_matches_xla(self, rng, C):
        x = jnp.asarray(rng.standard_normal((2, 128, C)), jnp.float32)
        a = np.asarray(knn_indices(x, 8))
        b = np.asarray(knn_pallas(x, 8, tile=64, interpret=True))
        # Allow tie reorders: compare exact distance sets.
        xn = np.asarray(x, np.float64)
        d = ((xn[:, :, None] - xn[:, None]) ** 2).sum(-1)
        da = np.sort(np.take_along_axis(d, a, -1), -1)
        db = np.sort(np.take_along_axis(d, b, -1), -1)
        np.testing.assert_allclose(da, db, atol=1e-9)

    def test_self_first(self, rng):
        x = jnp.asarray(rng.standard_normal((1, 128, 3)), jnp.float32)
        idx = np.asarray(knn_pallas(x, 4, tile=64, interpret=True))
        np.testing.assert_array_equal(idx[0, :, 0], np.arange(128))

    def test_uneven_tile_fallback(self, rng):
        # N=96 not divisible by 64 -> tile shrinks to 32 internally.
        x = jnp.asarray(rng.standard_normal((1, 96, 3)), jnp.float32)
        idx = np.asarray(knn_pallas(x, 4, tile=64, interpret=True))
        assert idx.shape == (1, 96, 4)


class TestKnnMomentsPallas:
    def test_moments_match_gather_path(self, rng):
        """Mask-matmul neighbourhood sums == gather-based sums."""
        from mlsp_tpu.ops.knn import knn_gather
        from mlsp_tpu.ops.pallas.normals_pallas import knn_moments_pallas

        k = 8
        x = jnp.asarray(rng.standard_normal((2, 128, 3)), jnp.float32)
        s1, s2 = knn_moments_pallas(x, k, tile=64, interpret=True)
        idx = knn_indices(x, k)
        neigh = np.asarray(knn_gather(x, idx), np.float64)  # [B, N, k, 3]
        np.testing.assert_allclose(np.asarray(s1), neigh.sum(-2),
                                   rtol=1e-5, atol=1e-5)
        outer = np.einsum("bnki,bnkj->bnij", neigh, neigh)
        np.testing.assert_allclose(
            np.asarray(s2).reshape(2, 128, 3, 3), outer, rtol=1e-4, atol=1e-4)

    def test_normals_via_moments_match_xla(self, rng):
        """The fused-kernel covariance (E[xx^T] - mu mu^T) feeds the same
        eigenvector math as the gather path (exact estimate_normals
        pallas-backend composition, minus the jit dispatch)."""
        from mlsp_tpu.ops import normals as normals_mod
        from mlsp_tpu.ops.pallas.normals_pallas import knn_moments_pallas

        k = 8
        x = jnp.asarray(rng.standard_normal((2, 128, 3)), jnp.float32)
        want = np.asarray(normals_mod.estimate_normals(x, k, backend="xla"))

        s1, s2 = knn_moments_pallas(x, k, tile=64, interpret=True)
        mu = s1 / k
        cov = s2.reshape(2, 128, 3, 3) / k - mu[..., :, None] * mu[..., None, :]
        n = normals_mod._smallest_eigvec_3x3(cov)
        flip = jnp.sum(n * x, axis=-1, keepdims=True) > 0.0
        got = np.asarray(jnp.where(flip, -n, n))

        cos = np.abs((got * want).sum(-1))
        assert np.quantile(cos, 0.01) > 0.999, np.quantile(cos, 0.01)


class TestEdgeMomentsPallas:
    """Fused gather/scatter-free EdgeConv statistics kernel."""

    def _refs(self, xg, u, k):
        from mlsp_tpu.ops.knn import knn_gather

        idx = knn_indices(xg, k, backend="xla")
        g = knn_gather(u, idx)
        return (jnp.max(g, -2), jnp.min(g, -2), jnp.sum(g, -2),
                jnp.sum(g * g, -2))

    def test_forward_matches_gather_path(self, rng):
        from mlsp_tpu.ops.pallas.edge_pallas import edge_moments

        k = 6
        xg = jnp.asarray(rng.standard_normal((2, 64, 8)), jnp.float32)
        u = jnp.asarray(rng.standard_normal((2, 64, 16)), jnp.float32)
        outs = edge_moments(xg, u, k, True, tile=32, interpret=True)
        for name, got, want in zip("mx mn s1 s2".split(), outs,
                                   self._refs(xg, u, k)):
            np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                       rtol=1e-5, atol=1e-5, err_msg=name)
        # eval variant (max/min only) is bit-identical to the full one
        mx, mn = edge_moments(xg, u, k, False, tile=32, interpret=True)
        np.testing.assert_array_equal(np.asarray(mx), np.asarray(outs[0]))
        np.testing.assert_array_equal(np.asarray(mn), np.asarray(outs[1]))

    def test_backward_matches_gather_path(self, rng):
        """custom_vjp du == XLA scatter-path du, incl. equal-share ties
        (duplicate points force exact-equal neighbour features)."""
        from mlsp_tpu.ops.knn import knn_gather
        from mlsp_tpu.ops.pallas.edge_pallas import edge_moments

        k = 6
        pts = rng.standard_normal((2, 64, 8)).astype(np.float32)
        pts[:, 17] = pts[:, 3]  # duplicates -> ties in max/min credit
        pts[:, 41] = pts[:, 3]
        xg = jnp.asarray(pts)
        u = jnp.asarray(rng.standard_normal((2, 64, 16)), jnp.float32)
        u = u.at[:, 17].set(u[:, 3]).at[:, 41].set(u[:, 3])
        w = jnp.asarray(rng.standard_normal((4, 2, 64, 16)), jnp.float32)
        idx = knn_indices(xg, k, backend="xla")

        def f_ref(u_):
            g = knn_gather(u_, idx)
            outs = (jnp.max(g, -2), jnp.min(g, -2), jnp.sum(g, -2),
                    jnp.sum(g * g, -2))
            return sum((w[i] * o).sum() for i, o in enumerate(outs))

        def f_ker(u_):
            outs = edge_moments(xg, u_, k, True, tile=32, interpret=True)
            return sum((w[i] * o).sum() for i, o in enumerate(outs))

        ga = np.asarray(jax.grad(f_ref)(u))
        gb = np.asarray(jax.grad(f_ker)(u))
        np.testing.assert_allclose(gb, ga, rtol=1e-5,
                                   atol=1e-5 * np.abs(ga).max())

    def test_no_gradient_to_graph_features(self, rng):
        from mlsp_tpu.ops.pallas.edge_pallas import edge_moments

        xg = jnp.asarray(rng.standard_normal((1, 32, 4)), jnp.float32)
        u = jnp.asarray(rng.standard_normal((1, 32, 8)), jnp.float32)
        g = jax.grad(lambda x_: sum(
            o.sum() for o in edge_moments(x_, u, 4, True, 16, True)))(xg)
        np.testing.assert_array_equal(np.asarray(g), 0.0)

    def test_edgeconvm_layer_fused_matches_gather(self, rng):
        """One EdgeConvM layer, kernel_k vs gather path: same loss, same
        param grads (single-graph granularity — at model level tiny f32
        diffs flip near-tie neighbours in DEEPER dynamic-kNN graphs, a
        documented tie sensitivity shared by all knn backends)."""
        from mlsp_tpu.models.dgcnn import EdgeConvM

        x = jnp.asarray(rng.standard_normal((2, 64, 3)), jnp.float32)
        idx = knn_indices(x, 5, backend="xla")
        m_a, m_b = EdgeConvM(16), EdgeConvM(16, kernel_k=5)
        v = m_a.init({"params": jax.random.key(0)}, x, idx, True)
        cot = jnp.asarray(rng.standard_normal((2, 64, 16)), jnp.float32)

        def run(m, use_idx):
            def loss(p):
                o, upd = m.apply(
                    {"params": p, "batch_stats": v["batch_stats"]}, x,
                    idx if use_idx else None, True, mutable=["batch_stats"])
                return (o * cot).sum(), upd

            (l, upd), g = jax.value_and_grad(loss, has_aux=True)(v["params"])
            return l, g, upd["batch_stats"]

        la, ga, sa = run(m_a, True)
        lb, gb, sb = run(m_b, False)
        np.testing.assert_allclose(float(lb), float(la), rtol=1e-5)
        for t_a, t_b in ((ga, gb), (sa, sb)):
            jax.tree_util.tree_map(
                lambda a, b: np.testing.assert_allclose(
                    np.asarray(a), np.asarray(b), rtol=1e-4,
                    atol=1e-5 * max(float(jnp.abs(a).max()), 1.0)),
                t_a, t_b)

    def test_dgcnn_fused_forward_matches_moments(self, rng):
        """Full DGCNN forward with edge_impl='fused' matches 'moments'."""
        from mlsp_tpu.models import DGCNN

        x = jnp.asarray(rng.standard_normal((2, 64, 3)), jnp.float32)
        key = jax.random.key(0)
        m0 = DGCNN(num_classes=10, k=5, knn_backend="xla",
                   edge_impl="moments")
        m1 = DGCNN(num_classes=10, k=5, knn_backend="xla", edge_impl="fused")
        v0 = m0.init({"params": key}, x, train=False)
        a = np.asarray(m0.apply(v0, x, train=False)["cls"])
        b = np.asarray(m1.apply(v0, x, train=False)["cls"])
        np.testing.assert_allclose(b, a, rtol=1e-4, atol=1e-4)


class TestFpsPallas:
    def test_matches_xla(self, rng):
        import functools
        from jax.experimental import pallas as pl
        from jax.experimental.pallas import tpu as pltpu
        from mlsp_tpu.ops.pallas import fps_pallas as FP
        from mlsp_tpu.ops.fps import fps

        def fps_interp(xyz, npoint, start):
            B, N, _ = xyz.shape
            order = pl.pallas_call(
                functools.partial(FP._fps_kernel, npoint=npoint),
                out_shape=jax.ShapeDtypeStruct((B, N), jnp.int32),
                in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                          pl.BlockSpec(memory_space=pltpu.VMEM)],
                out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
                scratch_shapes=[pltpu.VMEM((B, N), jnp.float32)],
                interpret=True,
            )(start.astype(jnp.int32)[:, None],
              jnp.swapaxes(xyz.astype(jnp.float32), 1, 2))
            return jnp.argsort(order, axis=-1, stable=True)[:, :npoint]

        import jax
        x = jnp.asarray(rng.standard_normal((4, 128, 3)), jnp.float32)
        start = jnp.asarray(rng.integers(0, 128, 4), jnp.int32)
        a = np.asarray(fps(x, 32, start, backend="xla"))
        b = np.asarray(fps_interp(x, 32, start))
        np.testing.assert_array_equal(a, b)
