"""Kernel unit tests against numpy oracles."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mlsp_tpu import ops

from oracles import (
    sqdist_np,
    knn_np,
    fps_np,
    normals_np,
    radius_count_np,
    density_labels_np,
    masked_chamfer_np,
    reconstruction_loss_np,
    ball_query_np,
)


def clouds(rng, b=4, n=128):
    return rng.standard_normal((b, n, 3)).astype(np.float32) * 0.5


class TestPairwise:
    def test_matches_oracle(self, rng):
        x = clouds(rng)
        got = np.asarray(ops.pairwise_sqdist(x, x))
        for b in range(x.shape[0]):
            np.testing.assert_allclose(got[b], sqdist_np(x[b], x[b]), atol=1e-4)

    def test_cross(self, rng):
        x, y = clouds(rng, n=64), clouds(rng, n=96)
        got = np.asarray(ops.pairwise_sqdist(x, y))
        assert got.shape == (4, 64, 96)
        np.testing.assert_allclose(got[1], sqdist_np(x[1], y[1]), atol=1e-4)

    def test_nonnegative(self, rng):
        x = clouds(rng)
        assert np.asarray(ops.self_sqdist(x)).min() >= 0.0


class TestKnn:
    def test_self_first(self, rng):
        x = clouds(rng)
        idx = np.asarray(ops.knn_indices(x, 8))
        want = np.broadcast_to(np.arange(x.shape[1]), idx[..., 0].shape)
        np.testing.assert_array_equal(idx[..., 0], want)

    def test_neighbour_sets_match(self, rng):
        x = clouds(rng, b=2, n=64)
        idx = np.asarray(ops.knn_indices(x, 10))
        for b in range(2):
            want = knn_np(x[b], 10)
            # Ties can reorder equidistant neighbours; compare distances.
            dw = np.sort(sqdist_np(x[b], x[b])[np.arange(64)[:, None], want])
            dg = np.sort(sqdist_np(x[b], x[b])[np.arange(64)[:, None], idx[b]])
            np.testing.assert_allclose(dg, dw, atol=1e-4)

    def test_edge_features(self, rng):
        x = clouds(rng, b=2, n=32)
        idx = ops.knn_indices(x, 4)
        ef = np.asarray(ops.edge_features(jnp.asarray(x), idx))
        assert ef.shape == (2, 32, 4, 6)
        # Self neighbour (col 0) difference must be zero, center part = x.
        np.testing.assert_allclose(ef[:, :, 0, :3], 0.0, atol=1e-6)
        np.testing.assert_allclose(ef[:, :, 0, 3:], x, atol=1e-6)


class TestFps:
    def test_matches_oracle(self, rng):
        x = clouds(rng, b=3, n=100)
        start = np.array([0, 17, 99], dtype=np.int32)
        idx = np.asarray(ops.fps(x, 16, jnp.asarray(start)))
        for b in range(3):
            np.testing.assert_array_equal(idx[b], fps_np(x[b], 16, start[b]))

    def test_prefix_property(self, rng):
        x = clouds(rng, b=1, n=64)
        start = jnp.zeros(1, jnp.int32)
        full = np.asarray(ops.fps(x, 32, start))
        short = np.asarray(ops.fps(x, 8, start))
        np.testing.assert_array_equal(full[:, :8], short)

    def test_gather(self, rng):
        x = clouds(rng, b=2, n=50)
        idx = ops.fps(x, 10, jnp.zeros(2, jnp.int32))
        vals = np.asarray(ops.fps_gather(jnp.asarray(x), idx))
        np.testing.assert_allclose(vals[0], x[0][np.asarray(idx)[0]], atol=1e-6)


class TestNormals:
    def test_plane(self, rng):
        # Points on z=0 plane -> normal +-z everywhere.
        pts = rng.uniform(-1, 1, (1, 256, 3)).astype(np.float32)
        pts[..., 2] = 0.0
        n = np.asarray(ops.estimate_normals(pts, k=16, orient_to_origin=False))
        np.testing.assert_allclose(np.abs(n[..., 2]), 1.0, atol=1e-3)
        np.testing.assert_allclose(n[..., :2], 0.0, atol=1e-3)

    def test_matches_eigh_oracle(self, rng):
        x = clouds(rng, b=1, n=96)
        got = np.asarray(ops.estimate_normals(x, k=12, orient_to_origin=False))[0]
        want = normals_np(x[0], 12)
        # Compare up to sign via |cos| (the quantity the losses use).
        cos = np.abs((got * want).sum(-1))
        np.testing.assert_allclose(cos, 1.0, atol=1e-2)

    def test_orientation(self, rng):
        x = clouds(rng, b=2, n=64)
        n = np.asarray(ops.estimate_normals(x, k=8, orient_to_origin=True))
        dots = (n * x).sum(-1)
        assert (dots <= 1e-6).all()

    def test_unit_norm(self, rng):
        x = clouds(rng)
        n = np.asarray(ops.estimate_normals(x, k=10))
        np.testing.assert_allclose(np.linalg.norm(n, axis=-1), 1.0, atol=1e-4)


class TestDensity:
    def test_radius_count(self, rng):
        x = clouds(rng, b=2, n=128)
        got = np.asarray(ops.radius_count(x, 0.3))
        for b in range(2):
            np.testing.assert_allclose(got[b], radius_count_np(x[b], 0.3), atol=1e-3)

    def test_labels(self, rng):
        x = clouds(rng, b=2, n=128)
        cls, val = ops.density_labels(x, 0.3, num_cls=16, pergroup=2.0)
        cls, val = np.asarray(cls), np.asarray(val)
        for b in range(2):
            wcls, wval = density_labels_np(x[b], 0.3)
            np.testing.assert_allclose(val[b], wval, atol=1e-3)
            np.testing.assert_allclose(cls[b], wcls, atol=1e-6)
        np.testing.assert_allclose(cls.sum(-1), 1.0, atol=1e-6)

    def test_shift_clip(self, rng):
        x = clouds(rng, b=1, n=64)
        cls, val = ops.density_labels(x, 0.5, num_cls=16, pergroup=5.0, shift=10.0)
        val = np.asarray(val)
        assert val.min() >= 0.0 and val.max() <= 75.0

    def test_cap_boundary(self, rng):
        # Adversarial fixture: >100 in-radius neighbours, so the PCL K cap
        # binds. Point 0 sits at the cluster edge: inside every query's
        # radius, but NOT among the 100 nearest for central queries (the
        # reference then counts 100, not 99 — `MLSP/mlsp.py:253-255`).
        core = (0.02 * rng.standard_normal((240, 3)) + 1.0).astype(np.float32)
        core[0] = core[1:].mean(0) + np.float32([0.08, 0.0, 0.0])
        x = core[None]
        want = radius_count_np(core, 0.5, cap=100)
        got = np.asarray(ops.radius_count(x, 0.5))[0]
        assert want.max() == 100.0  # the cap actually binds
        assert (want == 99.0).any()  # ...and point 0 makes some cuts
        np.testing.assert_array_equal(got, want)


class TestChamfer:
    def test_reconstruction_loss(self, rng):
        pred = clouds(rng, b=3, n=64)
        gold = clouds(rng, b=3, n=64)
        mask = (rng.random((3, 64)) < 0.3).astype(np.float32)
        mask[:, 0] = 1.0  # never empty
        got = float(ops.reconstruction_loss(pred, gold, mask))
        want = reconstruction_loss_np(pred, gold, mask)
        np.testing.assert_allclose(got, want, rtol=1e-4)

    def test_zero_on_identical_masked(self, rng):
        p = clouds(rng, b=2, n=32)
        mask = np.ones((2, 32), np.float32)
        assert float(ops.reconstruction_loss(p, p, mask)) < 1e-5

    def test_nearest_index_pair(self, rng):
        pred = clouds(rng, b=2, n=48)
        gold = clouds(rng, b=2, n=48)
        mask = np.ones((2, 48), np.float32)
        i1, i2 = ops.nearest_index_pair(pred, gold, mask)
        i1, i2 = np.asarray(i1), np.asarray(i2)
        for b in range(2):
            d = sqdist_np(pred[b], gold[b])
            np.testing.assert_array_equal(i1[b], d.argmin(1))
            np.testing.assert_array_equal(i2[b], d.argmin(0))


class TestGrouping:
    def test_ball_query(self, rng):
        x = clouds(rng, b=2, n=128)
        centers = x[:, :8]
        idx = np.asarray(ops.ball_query(x, centers, 0.4, 16))
        for b in range(2):
            want = ball_query_np(x[b], centers[b], 0.4, 16)
            got_sets = [set(r) for r in idx[b]]
            want_sets = [set(r) for r in want]
            assert got_sets == want_sets

    def test_group_points(self, rng):
        x = clouds(rng, b=1, n=64)
        f = rng.standard_normal((1, 64, 5)).astype(np.float32)
        centers = x[:, :4]
        idx = ops.ball_query(x, centers, 0.5, 8)
        g = np.asarray(ops.group_points(x, f, centers, idx))
        assert g.shape == (1, 4, 8, 8)
        # xyz part is center-relative.
        i0 = int(np.asarray(idx)[0, 0, 0])
        np.testing.assert_allclose(g[0, 0, 0, :3], x[0, i0] - x[0, 0], atol=1e-6)
        np.testing.assert_allclose(g[0, 0, 0, 3:], f[0, i0], atol=1e-6)
