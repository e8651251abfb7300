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
