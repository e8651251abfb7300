"""AOT serving bundles: frozen StableHLO eval program + weights."""

import json

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mlsp_tpu import serving
from mlsp_tpu.models import make_model
from mlsp_tpu.train.state import create_train_state

pytestmark = pytest.mark.slow  # AOT bundle lowering (cpu+tpu programs)

B, N = 4, 64


def _state_and_model(name="pointnet", heads=()):
    model = make_model(name, 10, knn_backend="xla") if name == "dgcnn" \
        else make_model(name, 10)
    state = create_train_state(model, jax.random.key(0),
                               jnp.zeros((1, N, 3), jnp.float32),
                               heads=heads)
    return state, model


class TestServingBundle:
    def test_roundtrip_matches_live_model(self, tmp_path, rng):
        """Batch-polymorphic (default) bundle: one artifact, any B."""
        state, model = _state_and_model("dgcnn")
        meta = serving.save_serving_bundle(
            state, model, str(tmp_path / "b"), num_points=N)
        assert "cpu" in meta["platforms"] and meta["batch_size"] is None

        bundle = serving.load_serving_bundle(str(tmp_path / "b"))
        for bs in (B, 2 * B + 1):
            x = (rng.standard_normal((bs, N, 3)) * 0.5).astype(np.float32)
            frozen = bundle.predict(x)
            live = np.asarray(model.apply(
                {"params": state.params, "batch_stats": state.batch_stats},
                jnp.asarray(x), train=False)["cls"])
            np.testing.assert_allclose(frozen, live, rtol=1e-5, atol=1e-5)
            assert frozen.shape == (bs, 10)

    def test_wrong_shape_rejected(self, tmp_path, rng):
        state, model = _state_and_model()
        serving.save_serving_bundle(state, model, str(tmp_path / "b"),
                                    batch_size=B, num_points=N)
        bundle = serving.load_serving_bundle(str(tmp_path / "b"))
        with pytest.raises(ValueError, match="expects"):
            bundle.predict(np.zeros((B, N + 1, 3), np.float32))
        with pytest.raises(ValueError, match="expects"):
            # fixed-batch bundle rejects other batch sizes
            bundle.predict(np.zeros((B + 1, N, 3), np.float32))

    def test_seg_bundle_per_point_output(self, tmp_path, rng):
        """pointsegda bundle serves [B, N, C] per-point logits that match
        the live model."""
        from mlsp_tpu.models import DGCNNSeg

        model = DGCNNSeg(num_classes=8, knn_backend="xla")
        state = create_train_state(
            model, jax.random.key(0), jnp.zeros((1, N, 3), jnp.float32),
            heads=("seg", "defrec", "normal", "density"))
        meta = serving.save_serving_bundle(
            state, model, str(tmp_path / "b"), task="pointsegda",
            num_points=N)
        assert meta["task"] == "pointsegda"

        bundle = serving.load_serving_bundle(str(tmp_path / "b"))
        x = (rng.standard_normal((B, N, 3)) * 0.5).astype(np.float32)
        frozen = bundle.predict(x)
        live = np.asarray(model.apply(
            {"params": state.params, "batch_stats": state.batch_stats},
            jnp.asarray(x), train=False, heads=("seg",))["seg"])
        np.testing.assert_allclose(frozen, live, rtol=1e-5, atol=1e-5)
        assert frozen.shape == (B, N, 8)


class TestAotCLI:
    def test_aot_subcommand_end_to_end(self, tmp_path):
        from mlsp_tpu.cli import main
        from mlsp_tpu.utils import checkpoint

        state, model = _state_and_model("pointnet", ("defrec",))
        ckpt = str(tmp_path / "m.ckpt")
        checkpoint.save_train_state(ckpt, state)
        rc = main([
            "aot", "--model_file", ckpt, "--model", "pointnet",
            "--num_points", str(N), "--test_batch_size", str(B),
            "--out_path", str(tmp_path), "--exp_name", "aot",
            "--output", str(tmp_path / "bundle"),
        ])
        assert rc == 0
        meta = json.loads((tmp_path / "bundle" / "meta.json").read_text())
        assert meta["batch_size"] is None  # CLI exports batch-polymorphic
        bundle = serving.load_serving_bundle(str(tmp_path / "bundle"))
        out = bundle.predict(np.zeros((B, N, 3), np.float32))
        assert out.shape == (B, 10) and np.isfinite(out).all()

    def test_aot_subcommand_seg_task(self, tmp_path):
        from mlsp_tpu.cli import main
        from mlsp_tpu.models import DGCNNSeg
        from mlsp_tpu.utils import checkpoint

        model = DGCNNSeg(num_classes=8, knn_backend="xla")
        state = create_train_state(
            model, jax.random.key(0), jnp.zeros((1, N, 3), jnp.float32),
            heads=("seg", "defrec", "normal", "density"))
        ckpt = str(tmp_path / "m.ckpt")
        checkpoint.save_train_state(ckpt, state)
        rc = main([
            "aot", "--task", "pointsegda", "--model_file", ckpt,
            "--model", "dgcnn_seg", "--num_points", str(N), "--num_class",
            "8", "--test_batch_size", str(B), "--out_path", str(tmp_path),
            "--exp_name", "aotseg", "--output", str(tmp_path / "bundle"),
        ])
        assert rc == 0
        bundle = serving.load_serving_bundle(str(tmp_path / "bundle"))
        out = bundle.predict(np.zeros((B, N, 3), np.float32))
        assert out.shape == (B, N, 8) and np.isfinite(out).all()
