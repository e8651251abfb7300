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
