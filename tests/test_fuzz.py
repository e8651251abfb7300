"""Randomized-shape sweeps of the kernel layer against the numpy oracles.

The unit tests in `test_ops.py` pin one or two fixed shapes per op; this
sweep drives the same oracles across seeded random configurations that
deliberately include the awkward corners — B=1, odd/prime N far from any
tile multiple, k=1, k=N, npoint=N, and a duplicate-point config where
distance ties are everywhere. Everything is seeded: failures reproduce.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from mlsp_tpu import ops

pytestmark = pytest.mark.slow  # randomized many-shape compile sweeps

from oracles import (
    ball_query_np,
    density_labels_np,
    fps_np,
    knn_np,
    radius_count_np,
    reconstruction_loss_np,
    sqdist_np,
)


def _configs():
    rng = np.random.default_rng(2024)
    cfgs = []
    for _ in range(8):
        n = int(rng.integers(5, 132))
        cfgs.append(dict(
            b=int(rng.integers(1, 5)),
            n=n,
            k=int(rng.integers(1, min(16, n) + 1)),
            seed=int(rng.integers(1 << 30)),
            dup=False,
        ))
    # boundary + tie configs
    cfgs.append(dict(b=1, n=5, k=1, seed=7, dup=False))
    cfgs.append(dict(b=2, n=17, k=17, seed=8, dup=False))   # k == N
    cfgs.append(dict(b=2, n=48, k=8, seed=9, dup=True))     # exact ties
    return cfgs


CONFIGS = _configs()
IDS = [f"b{c['b']}n{c['n']}k{c['k']}{'dup' if c['dup'] else ''}"
       for c in CONFIGS]


def _cloud(cfg):
    rng = np.random.default_rng(cfg["seed"])
    x = rng.standard_normal((cfg["b"], cfg["n"], 3)).astype(np.float32) * 0.5
    if cfg["dup"]:  # half the points are exact copies: 0-distance ties
        x[:, cfg["n"] // 2:] = x[:, : cfg["n"] - cfg["n"] // 2]
    return x


@pytest.mark.parametrize("cfg", CONFIGS, ids=IDS)
class TestFuzzKernels:
    def test_knn_neighbour_distances(self, cfg):
        x = _cloud(cfg)
        idx = np.asarray(ops.knn_indices(x, cfg["k"]))
        assert idx.shape == (cfg["b"], cfg["n"], cfg["k"])
        for b in range(cfg["b"]):
            d = sqdist_np(x[b], x[b])
            want = np.sort(d[np.arange(cfg["n"])[:, None],
                             knn_np(x[b], cfg["k"])])
            got = np.sort(d[np.arange(cfg["n"])[:, None], idx[b]])
            # ties reorder equidistant neighbours; the distance multiset
            # is the invariant
            np.testing.assert_allclose(got, want, atol=1e-4)

    def test_fps_matches_oracle(self, cfg):
        if cfg["dup"]:
            pytest.skip("argmax over tied distances is order-sensitive")
        x = _cloud(cfg)
        rng = np.random.default_rng(cfg["seed"] + 1)
        npoint = int(rng.integers(1, cfg["n"] + 1))
        start = rng.integers(0, cfg["n"], cfg["b"]).astype(np.int32)
        idx = np.asarray(ops.fps(x, npoint, jnp.asarray(start)))
        for b in range(cfg["b"]):
            np.testing.assert_array_equal(idx[b],
                                          fps_np(x[b], npoint, start[b]))

    def test_radius_count_and_labels(self, cfg):
        x = _cloud(cfg)
        for radius in (0.1, 0.4):
            got = np.asarray(ops.radius_count(x, radius))
            cls, val = ops.density_labels(x, radius, num_cls=16,
                                          pergroup=2.0)
            cls, val = np.asarray(cls), np.asarray(val)
            for b in range(cfg["b"]):
                np.testing.assert_allclose(
                    got[b], radius_count_np(x[b], radius), atol=1e-3)
                wcls, wval = density_labels_np(x[b], radius)
                np.testing.assert_allclose(val[b], wval, atol=1e-3)
                np.testing.assert_allclose(cls[b], wcls, atol=1e-6)

    def test_chamfer_and_nearest_indices(self, cfg):
        rng = np.random.default_rng(cfg["seed"] + 2)
        pred = _cloud(cfg)
        gold = rng.standard_normal(pred.shape).astype(np.float32) * 0.5
        mask = (rng.random(pred.shape[:2]) < 0.5).astype(np.float32)
        mask[:, 0] = 1.0
        got = float(ops.reconstruction_loss(pred, gold, mask))
        np.testing.assert_allclose(
            got, reconstruction_loss_np(pred, gold, mask), rtol=1e-4)
        if cfg["dup"]:
            return  # argmin over tied distances is order-sensitive
        i1, i2 = ops.nearest_index_pair(pred, gold,
                                        np.ones(pred.shape[:2], np.float32))
        for b in range(cfg["b"]):
            d = sqdist_np(pred[b], gold[b])
            np.testing.assert_array_equal(np.asarray(i1)[b], d.argmin(1))
            np.testing.assert_array_equal(np.asarray(i2)[b], d.argmin(0))

    def test_normals_are_minimal_rayleigh(self, cfg):
        if cfg["n"] < 16:
            pytest.skip("neighbourhood too small for a stable covariance")
        x = _cloud(cfg)
        k = max(cfg["k"], 6)
        n = np.asarray(ops.estimate_normals(x, k=k, orient_to_origin=False))
        np.testing.assert_allclose(np.linalg.norm(n, axis=-1), 1.0,
                                   atol=1e-3)
        # Degenerate/isotropic neighbourhoods make the eigVECTOR
        # ill-conditioned, so compare the Rayleigh quotient against the
        # oracle's smallest eigenVALUE instead — a well-conditioned
        # invariant that any correct normal must attain.
        for b in range(cfg["b"]):
            nbr = x[b][knn_np(x[b], k)]             # [N, k, 3]
            c = nbr - nbr.mean(1, keepdims=True)
            cov = np.einsum("nki,nkj->nij", c, c) / k
            lmin = np.linalg.eigvalsh(cov)[:, 0]
            ray = np.einsum("ni,nij,nj->n", n[b], cov, n[b])
            np.testing.assert_allclose(ray, lmin, atol=1e-4)

    def test_ball_query_sets(self, cfg):
        x = _cloud(cfg)
        rng = np.random.default_rng(cfg["seed"] + 3)
        s = min(4, cfg["n"])
        centers = x[:, :s]
        cap = int(rng.integers(1, cfg["n"] + 1))
        idx = np.asarray(ops.ball_query(x, centers, 0.4, cap))
        for b in range(cfg["b"]):
            want = ball_query_np(x[b], centers[b], 0.4, cap)
            assert [set(r) for r in idx[b]] == [set(r) for r in want]


@pytest.mark.parametrize("b,n,k", [(1, 37, 5), (3, 101, 11)])
def test_edgeconv_moments_equivalence_odd_shapes(b, n, k):
    """EdgeConvM's analytic BN-through-max moments (incl. the Bessel
    n=B*N*k correction) must match the direct EdgeConv at shapes far
    from the tuned 1024-point case."""
    import jax

    from mlsp_tpu.models.dgcnn import EdgeConv, EdgeConvM
    from mlsp_tpu.ops.knn import knn_indices

    x = jnp.asarray(
        np.random.default_rng(b * n).standard_normal((b, n, 3)),
        jnp.float32)
    idx = knn_indices(x, k)
    a, m = EdgeConv(16), EdgeConvM(16)
    va = a.init({"params": jax.random.key(0)}, x, idx, True)
    pb = {"w_diff": va["params"]["w_diff"],
          "w_center": va["params"]["w_center"],
          "scale": va["params"]["BatchNorm_0"]["scale"],
          "bias": va["params"]["BatchNorm_0"]["bias"]}
    sb = {"mean": va["batch_stats"]["BatchNorm_0"]["mean"],
          "var": va["batch_stats"]["BatchNorm_0"]["var"]}
    oa, ma = a.apply(va, x, idx, True, mutable=["batch_stats"])
    ob, mb = m.apply({"params": pb, "batch_stats": sb}, x, idx, True,
                     mutable=["batch_stats"])
    np.testing.assert_allclose(np.asarray(oa), np.asarray(ob), atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(ma["batch_stats"]["BatchNorm_0"]["var"]),
        np.asarray(mb["batch_stats"]["var"]), atol=1e-5)


def test_knn_k_exceeding_points_rejected():
    x = jnp.zeros((1, 5, 3), jnp.float32)
    with pytest.raises(ValueError, match="k=9 exceeds the 5"):
        ops.knn_indices(x, 9)


MODELS = ["pointnet", "dgcnn", "dgcnn_seg", "pointnet2",
          "point_transformer", "hengshuang", "hengshuang_seg", "vit"]


@pytest.mark.parametrize("name", MODELS)
def test_models_handle_irregular_point_counts(name):
    """Every model family accepts point counts far from the datasets'
    1024/2048 (odd, small, non-tile-aligned) with finite outputs — a
    user's own clouds need no padding to a magic size."""
    import jax

    from mlsp_tpu.models import make_model

    kw = {"knn_backend": "xla"} if name != "pointnet" else {}
    model = make_model(name, 8 if "seg" in name else 10, **kw)
    for n in (33, 250):
        x = jnp.asarray(
            np.random.default_rng(n).standard_normal((2, n, 3)),
            jnp.float32)
        v = model.init({"params": jax.random.key(0)}, x, train=False)
        out = model.apply(v, x, train=False)
        assert all(np.isfinite(np.asarray(a)).all() for a in out.values())
        if "seg" in name:
            assert out["seg"].shape == (2, n, 8)
        else:
            assert out["cls"].shape == (2, 10)


@pytest.mark.parametrize("cfg", CONFIGS, ids=IDS)
class TestFuzzTransforms:
    """SSL transforms keep their invariants at every shape — including
    clouds far too small to satisfy MIN_PTS, where the masks may select
    few (or no) points but nothing may go non-finite."""

    def test_deform_invariants(self, cfg):
        import jax

        from mlsp_tpu import transforms as T

        x = _cloud(cfg)
        key = jax.random.key(cfg["seed"])
        out, mask = T.deform_batch(key, jnp.asarray(x))
        out, mask = np.asarray(out), np.asarray(mask)
        assert np.isfinite(out).all()
        assert set(np.unique(mask)) <= {0.0, 1.0}
        for b in range(cfg["b"]):
            sel = mask[b] > 0
            np.testing.assert_array_equal(out[b][~sel], x[b][~sel])
        # the loss downstream of the (possibly empty) mask stays finite
        loss = float(ops.reconstruction_loss(out, jnp.asarray(x),
                                             jnp.asarray(mask)))
        assert np.isfinite(loss)

    def test_collapse_invariants(self, cfg):
        import jax

        from mlsp_tpu.transforms import deform

        x = _cloud(cfg)
        out, mask = deform.collapse_to_point_batch(
            jax.random.key(cfg["seed"] + 1), jnp.asarray(x))
        out, mask = np.asarray(out), np.asarray(mask)
        assert np.isfinite(out).all()
        for b in range(cfg["b"]):
            sel = mask[b] > 0
            np.testing.assert_array_equal(out[b][~sel], x[b][~sel])

    def test_scan_invariants(self, cfg):
        import jax

        from mlsp_tpu import transforms as T

        x = _cloud(cfg)
        scan, mask = T.scan_batch(jax.random.key(cfg["seed"] + 2),
                                  jnp.asarray(x))
        scan, mask = np.asarray(scan), np.asarray(mask)
        assert np.isfinite(scan).all()
        for b in range(cfg["b"]):
            kept = mask[b] == 0
            np.testing.assert_array_equal(scan[b][kept], x[b][kept])
            np.testing.assert_array_equal(scan[b][~kept], 0.0)
