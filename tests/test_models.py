"""Model shape/jit/mode tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mlsp_tpu.models import DGCNN, DGCNNSeg, PointNet, PointNet2SSG, make_model

B, N = 2, 128


def init_and_apply(model, x, heads=(), train=False):
    rngs = {"params": jax.random.key(0)}
    variables = model.init(rngs, x, train=False, heads=heads)
    extra = {"dropout": jax.random.key(1)} if train else {}
    out, mutated = model.apply(
        variables, x, train=train, heads=heads,
        rngs=extra, mutable=["batch_stats"] if train else [],
    )
    return variables, out


@pytest.fixture(scope="module")
def x():
    return jnp.asarray(
        np.random.default_rng(0).standard_normal((B, N, 3)), jnp.float32
    )


class TestDGCNN:
    def test_cls_shapes(self, x):
        model = DGCNN(num_classes=10, k=8)
        _, out = init_and_apply(model, x)
        assert out["cls"].shape == (B, 10)
        assert out["feat"].shape == (B, 1024)
        assert "defrec" not in out

    def test_all_heads(self, x):
        model = DGCNN(num_classes=10, k=8)
        _, out = init_and_apply(model, x, heads=("defrec", "normal", "scan", "density"))
        assert out["defrec"].shape == (B, N, 3)
        assert out["normal"].shape == (B, N, 3)
        assert out["scan"].shape == (B, N, 3)
        assert out["density"].shape == (B, N, 16)
        assert out["density_mse"].shape == (B, N)
        # density head: probabilities sum to 1, expectation within bins
        np.testing.assert_allclose(np.asarray(out["density"]).sum(-1), 1.0, atol=1e-5)
        assert float(out["density_mse"].max()) <= 15 * 2.0 + 1e-4

    def test_train_mode_mutates_stats(self, x):
        model = DGCNN(num_classes=10, k=8)
        rngs = {"params": jax.random.key(0)}
        variables = model.init(rngs, x, train=False)
        out, mutated = model.apply(
            variables, x, train=True, rngs={"dropout": jax.random.key(1)},
            mutable=["batch_stats"],
        )
        before = jax.tree_util.tree_leaves(variables["batch_stats"])
        after = jax.tree_util.tree_leaves(mutated["batch_stats"])
        assert any(
            not np.allclose(np.asarray(a), np.asarray(b)) for a, b in zip(before, after)
        )

    def test_jit_apply(self, x):
        model = DGCNN(num_classes=10, k=8)
        variables = model.init({"params": jax.random.key(0)}, x, train=False)

        @jax.jit
        def fwd(v, x):
            return model.apply(v, x, train=False)["cls"]

        out = fwd(variables, x)
        assert out.shape == (B, 10) and bool(jnp.isfinite(out).all())


class TestPointNet:
    def test_shapes(self, x):
        model = PointNet(num_classes=10)
        _, out = init_and_apply(model, x, heads=("defrec",))
        assert out["cls"].shape == (B, 10)
        assert out["defrec"].shape == (B, N, 3)


class TestDGCNNSeg:
    def test_shapes(self, x):
        model = DGCNNSeg(num_classes=8, k=8)
        _, out = init_and_apply(model, x, heads=("seg", "defrec", "normal", "density"))
        assert out["seg"].shape == (B, N, 8)
        assert out["defrec"].shape == (B, N, 3)
        assert out["normal"].shape == (B, N, 3)
        assert out["density"].shape == (B, N, 16)


class TestPointNet2:
    def test_shapes(self, x):
        model = PointNet2SSG(num_classes=10)
        _, out = init_and_apply(model, x)
        assert out["cls"].shape == (B, 10)
        assert out["feat"].shape == (B, 1024)


class TestFactory:
    def test_make_model(self):
        assert isinstance(make_model("dgcnn", 10), DGCNN)
        assert isinstance(make_model("pointnet", 10), PointNet)
        assert isinstance(make_model("dgcnn_seg", 8), DGCNNSeg)
        assert isinstance(make_model("pointnet2", 10), PointNet2SSG)
        with pytest.raises(ValueError):
            make_model("nope", 10)


class TestEdgeConvEquivalence:
    """EdgeConvM (moments form) must match EdgeConv (direct form) in
    outputs, running stats, and gradients — including negative-gamma
    channels that flip the max/min selection."""

    def test_outputs_stats_grads_match(self, x):
        from mlsp_tpu.models.dgcnn import EdgeConv, EdgeConvM
        from mlsp_tpu.ops.knn import knn_indices

        idx = knn_indices(x, 8)
        a, b = EdgeConv(32), EdgeConvM(32)
        va = a.init({"params": jax.random.key(0)}, x, idx, True)
        scale = va["params"]["BatchNorm_0"]["scale"].at[3].set(-0.7).at[7].set(1.3)
        bias = va["params"]["BatchNorm_0"]["bias"].at[1].set(0.2)
        pa = dict(va["params"]); pa["BatchNorm_0"] = {"scale": scale, "bias": bias}
        pb = {"w_diff": va["params"]["w_diff"], "w_center": va["params"]["w_center"],
              "scale": scale, "bias": bias}
        sb = {"mean": va["batch_stats"]["BatchNorm_0"]["mean"],
              "var": va["batch_stats"]["BatchNorm_0"]["var"]}

        for train in (True, False):
            oa, ma = a.apply({"params": pa, "batch_stats": va["batch_stats"]},
                             x, idx, train, mutable=["batch_stats"])
            ob, mb = b.apply({"params": pb, "batch_stats": sb},
                             x, idx, train, mutable=["batch_stats"])
            np.testing.assert_allclose(np.asarray(oa), np.asarray(ob),
                                       atol=1e-5, err_msg=f"train={train}")
            if train:
                np.testing.assert_allclose(
                    np.asarray(ma["batch_stats"]["BatchNorm_0"]["mean"]),
                    np.asarray(mb["batch_stats"]["mean"]), atol=1e-6)
                np.testing.assert_allclose(
                    np.asarray(ma["batch_stats"]["BatchNorm_0"]["var"]),
                    np.asarray(mb["batch_stats"]["var"]), atol=1e-5)

        def la(p):
            o, _ = a.apply({"params": p, "batch_stats": va["batch_stats"]},
                           x, idx, True, mutable=["batch_stats"])
            return jnp.sum(o * jnp.cos(o))

        def lb(p):
            o, _ = b.apply({"params": p, "batch_stats": sb},
                           x, idx, True, mutable=["batch_stats"])
            return jnp.sum(o * jnp.cos(o))

        ga, gb = jax.grad(la)(pa), jax.grad(lb)(pb)
        np.testing.assert_allclose(
            np.asarray(ga["w_diff"]["kernel"]), np.asarray(gb["w_diff"]["kernel"]),
            atol=2e-3)
        np.testing.assert_allclose(
            np.asarray(ga["BatchNorm_0"]["scale"]), np.asarray(gb["scale"]),
            atol=2e-3)


class TestSplitDense:
    """SplitDense([a | broadcast(b)]) must equal nn.Dense on the explicit
    concat with the SAME [Ca+Cb, F] kernel — values and gradients. The
    heads use it so the global-feature half multiplies its kernel once
    per cloud instead of once per point."""

    @pytest.mark.parametrize("use_bias", [False, True])
    def test_matches_fused_dense(self, use_bias):
        from flax import linen as nn

        from mlsp_tpu.models.layers import SplitDense

        rng = np.random.default_rng(3)
        a = jnp.asarray(rng.standard_normal((B, N, 24)), jnp.float32)
        b = jnp.asarray(rng.standard_normal((B, 40)), jnp.float32)
        split = SplitDense(17, use_bias=use_bias)
        v = split.init(jax.random.key(0), a, b)

        fused = nn.Dense(17, use_bias=use_bias)
        cat = jnp.concatenate(
            [a, jnp.broadcast_to(b[:, None, :], (B, N, 40))], axis=-1)
        want = fused.apply({"params": v["params"]}, cat)
        got = split.apply(v, a, b)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)

        # Same init family/shapes as the fused layer.
        vf = fused.init(jax.random.key(0), cat)
        assert v["params"]["kernel"].shape == vf["params"]["kernel"].shape

        gs = jax.grad(lambda p: jnp.sum(jnp.sin(split.apply({"params": p}, a, b))))(
            v["params"])
        gf = jax.grad(lambda p: jnp.sum(jnp.sin(fused.apply({"params": p}, cat))))(
            v["params"])
        np.testing.assert_allclose(np.asarray(gs["kernel"]),
                                   np.asarray(gf["kernel"]), rtol=1e-4, atol=2e-4)

    def test_head_tuple_input_matches_concat(self, x):
        """A full PointMLPHead fed the (per-point, global) tuple equals the
        same head fed the materialized concat (identical params)."""
        from mlsp_tpu.models.layers import PointMLPHead

        rng = np.random.default_rng(4)
        a = jnp.asarray(rng.standard_normal((B, N, 32)), jnp.float32)
        g = jnp.asarray(rng.standard_normal((B, 48)), jnp.float32)
        cat = jnp.concatenate(
            [a, jnp.broadcast_to(g[:, None, :], (B, N, 48))], axis=-1)

        head = PointMLPHead(3)
        v = head.init({"params": jax.random.key(0)}, (a, g), train=False)
        got = head.apply(v, (a, g), train=False)
        want = head.apply(v, cat, train=False)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)


class TestPointViT:
    """Working redesign of the reference's bit-rotted ViT variant
    (vit_utils.py:68-283); both group-embedder types."""

    @pytest.mark.parametrize("enc", ["relative", "pointnet", "dgcnn", "pointnet_tnet"])
    def test_shapes_and_defrec(self, x, enc):
        from mlsp_tpu.models import make_model

        model = make_model("vit", 10, trans_dim=64, encoder_dims=48, depth=4,
                           heads=2, num_group=16, group_size=8,
                           encoder_type=enc, fetch_idx=(1, 3))
        v, out = init_and_apply(model, x, heads=("defrec",))
        assert out["cls"].shape == (B, 10)
        assert out["defrec"].shape == (B, N, 3)
        assert out["feat"].shape == (B, 2 * 64)
        assert all(np.isfinite(np.asarray(t)).all() for t in out.values())

    def test_use_absolute_relative_encoder(self, x):
        from mlsp_tpu.models import make_model

        model = make_model("vit", 10, trans_dim=64, encoder_dims=48, depth=2,
                           heads=2, num_group=16, group_size=8,
                           encoder_type="relative", use_absolute=True,
                           fetch_idx=(1,))
        _, out = init_and_apply(model, x)
        assert out["cls"].shape == (B, 10)
        assert np.isfinite(np.asarray(out["cls"])).all()

    def test_fetch_idx_validated_against_depth(self, x):
        from mlsp_tpu.models import make_model

        model = make_model("vit", 10, trans_dim=64, encoder_dims=48, depth=2,
                           heads=2, num_group=16, group_size=8)  # default (3,7,11)
        with pytest.raises(ValueError, match="fetch_idx"):
            model.init({"params": jax.random.key(0)}, x, train=False, heads=())

    def test_train_mode_mutates_stats(self, x):
        from mlsp_tpu.models import make_model

        model = make_model("vit", 10, trans_dim=64, encoder_dims=48, depth=2,
                           heads=2, num_group=16, group_size=8, fetch_idx=(1,))
        rngs = {"params": jax.random.key(0)}
        v = model.init(rngs, x, train=False, heads=())
        out, mut = model.apply(
            v, x, train=True, heads=(), rngs={"dropout": jax.random.key(1)},
            mutable=["batch_stats"],
        )
        before = jax.tree_util.tree_leaves(v["batch_stats"])
        after = jax.tree_util.tree_leaves(mut["batch_stats"])
        assert any(not np.allclose(a, b) for a, b in zip(before, after))
