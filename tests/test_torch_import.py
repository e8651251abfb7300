"""Torch-checkpoint import tests.

Builds a synthetic reference-format state_dict (keys/shapes per
`PointDA/Models.py:82-105` + `model_utils.py`), imports it, and checks
every mapped leaf (transposes, EdgeConv concat-weight splits, BN stats).
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

from mlsp_tpu.models import DGCNN
from mlsp_tpu.utils.torch_import import import_dgcnn


def _conv2d(sd, name, cin, cout, rng):
    sd[f"{name}.conv.0.weight"] = torch.tensor(
        rng.standard_normal((cout, cin, 1, 1)), dtype=torch.float32)
    for suffix, shape in (("weight", cout), ("bias", cout),
                          ("running_mean", cout), ("running_var", cout)):
        val = rng.standard_normal(shape) if suffix != "running_var" else \
            np.abs(rng.standard_normal(shape)) + 0.5
        sd[f"{name}.conv.1.{suffix}"] = torch.tensor(val, dtype=torch.float32)
    sd[f"{name}.conv.1.num_batches_tracked"] = torch.tensor(0)


def _fc(sd, name, cin, cout, rng, bn=True, bias=True):
    sd[f"{name}.fc.0.weight" if bn else f"{name}.weight"] = torch.tensor(
        rng.standard_normal((cout, cin)), dtype=torch.float32)
    if bias:
        sd[f"{name}.fc.0.bias" if bn else f"{name}.bias"] = torch.tensor(
            rng.standard_normal(cout), dtype=torch.float32)
    if bn:
        for suffix in ("weight", "bias", "running_mean", "running_var"):
            val = rng.standard_normal(cout) if suffix != "running_var" else \
                np.abs(rng.standard_normal(cout)) + 0.5
            sd[f"{name}.fc.1.{suffix}"] = torch.tensor(val, dtype=torch.float32)


def _conv1d(sd, name, cin, cout, rng, bias=False):
    sd[f"{name}.weight"] = torch.tensor(
        rng.standard_normal((cout, cin, 1)), dtype=torch.float32)
    if bias:
        sd[f"{name}.bias"] = torch.tensor(rng.standard_normal(cout),
                                          dtype=torch.float32)


def _bn1d(sd, name, c, rng):
    for suffix in ("weight", "bias", "running_mean", "running_var"):
        val = rng.standard_normal(c) if suffix != "running_var" else \
            np.abs(rng.standard_normal(c)) + 0.5
        sd[f"{name}.{suffix}"] = torch.tensor(val, dtype=torch.float32)


def make_reference_state_dict(rng, prefix=""):
    sd = {}
    p = prefix
    # input_transform_net (transform_net(args, 6, 3))
    _conv2d(sd, p + "input_transform_net.conv2d1", 6, 64, rng)
    _conv2d(sd, p + "input_transform_net.conv2d2", 64, 128, rng)
    _conv2d(sd, p + "input_transform_net.conv2d3", 128, 1024, rng)
    # dgcnn transform-net fcs are bias-free (model_utils.py:98-105)
    _fc(sd, p + "input_transform_net.fc1", 1024, 512, rng, bias=False)
    _fc(sd, p + "input_transform_net.fc2", 512, 256, rng)  # fc2 bias default True
    _fc(sd, p + "input_transform_net.fc3", 256, 9, rng, bn=False)
    # EdgeConv stages
    _conv2d(sd, p + "conv1", 6, 64, rng)
    _conv2d(sd, p + "conv2", 128, 64, rng)
    _conv2d(sd, p + "conv3", 128, 128, rng)
    _conv2d(sd, p + "conv4", 256, 256, rng)
    # conv5 + bn5
    _conv1d(sd, p + "conv5", 512, 1024, rng)
    _bn1d(sd, p + "bn5", 1024, rng)
    # classifier
    _fc(sd, p + "C.mlp1", 1024, 512, rng)
    _fc(sd, p + "C.mlp2", 512, 256, rng)
    _fc(sd, p + "C.mlp3", 256, 10, rng, bn=False)
    # heads
    for h in ("DefRec", "Norm_pred", "Rec_scan"):
        _conv1d(sd, f"{p}{h}.conv1", 1536, 256, rng)
        _conv1d(sd, f"{p}{h}.conv2", 256, 256, rng)
        _conv1d(sd, f"{p}{h}.conv3", 256, 128, rng)
        _conv1d(sd, f"{p}{h}.conv4", 128, 3, rng)
        for j, c in ((1, 256), (2, 256), (3, 128)):
            _bn1d(sd, f"{p}{h}.bn{j}", c, rng)
    # density head
    _conv1d(sd, p + "Density_cls.conv1", 1536, 512, rng)
    _bn1d(sd, p + "Density_cls.bn1", 512, rng)
    _fc(sd, p + "Density_cls.mlp1", 512, 256, rng)
    _fc(sd, p + "Density_cls.mlp2", 256, 256, rng)
    _fc(sd, p + "Density_cls.mlp3", 256, 16, rng, bn=False)
    sd[p + "Density_cls.fc2.weight"] = torch.tensor(
        (2.0 * np.arange(16)).reshape(1, 16), dtype=torch.float32)
    return sd


@pytest.fixture(scope="module")
def imported():
    rng = np.random.default_rng(0)
    sd = make_reference_state_dict(rng)
    model = DGCNN(num_classes=10, k=20)
    variables = jax.jit(
        lambda r, x: model.init({"params": r}, x, train=False,
                                heads=("defrec", "normal", "scan", "density"))
    )(jax.random.key(0), jnp.zeros((1, 64, 3), jnp.float32))
    new = import_dgcnn(sd, variables)
    return sd, variables, new


class TestTorchImport:
    def test_edgeconv_split(self, imported):
        sd, _, new = imported
        w = sd["conv2.conv.0.weight"].numpy().reshape(64, 128)
        blk = new["params"]["EdgeConvM_1"]
        np.testing.assert_allclose(blk["w_diff"]["kernel"], w[:, :64].T)
        np.testing.assert_allclose(blk["w_center"]["kernel"], w[:, 64:].T)

    def test_bn_stats(self, imported):
        sd, _, new = imported
        np.testing.assert_allclose(
            new["batch_stats"]["EdgeConvM_0"]["mean"],
            sd["conv1.conv.1.running_mean"].numpy())
        np.testing.assert_allclose(
            new["params"]["EdgeConvM_3"]["scale"],
            sd["conv4.conv.1.weight"].numpy())

    def test_linear_transpose(self, imported):
        sd, _, new = imported
        np.testing.assert_allclose(
            new["params"]["Classifier_0"]["Dense_0"]["kernel"],
            sd["C.mlp3.weight"].numpy().T)
        np.testing.assert_allclose(
            new["params"]["Classifier_0"]["Dense_0"]["bias"],
            sd["C.mlp3.bias"].numpy())

    def test_head_conv_kernels(self, imported):
        sd, _, new = imported
        np.testing.assert_allclose(
            new["params"]["NormPred"]["DenseBN_0"]["Dense_0"]["kernel"],
            sd["Norm_pred.conv1.weight"].numpy().reshape(256, 1536).T)

    def test_all_leaves_replaced(self, imported):
        _, old, new = imported
        import jax.tree_util as tu

        oldl = tu.tree_leaves(old["params"])
        newl = tu.tree_leaves(new["params"])
        changed = sum(
            not np.allclose(np.asarray(a), np.asarray(b))
            for a, b in zip(oldl, newl)
        )
        # every leaf except the TransformNet identity-ish outputs should change
        assert changed >= len(oldl) - 2

    def test_forward_runs_with_imported(self, imported):
        _, _, new = imported
        model = DGCNN(num_classes=10, k=20)
        x = jnp.asarray(np.random.default_rng(1).standard_normal((2, 64, 3)),
                        jnp.float32)
        out = model.apply(new, x, train=False, heads=("defrec",))
        assert np.isfinite(np.asarray(out["cls"])).all()

    def test_bad_density_bins_rejected(self, imported):
        _, variables, _ = imported
        rng = np.random.default_rng(2)
        sd = make_reference_state_dict(rng)
        sd["Density_cls.fc2.weight"] = torch.tensor(
            rng.standard_normal((1, 16)), dtype=torch.float32)
        with pytest.raises(ValueError, match="fc2"):
            import_dgcnn(sd, variables)

    def test_pergroup_mismatch_rejected(self, imported):
        _, variables, _ = imported
        sd = make_reference_state_dict(np.random.default_rng(3))
        sd["Density_cls.fc2.weight"] = torch.tensor(
            (5.0 * np.arange(16)).reshape(1, 16), dtype=torch.float32)
        with pytest.raises(ValueError, match="pergroup"):
            import_dgcnn(sd, variables, pergroup=2.0)


class TestLoadModelWeights:
    """`checkpoint.load_model_weights` — the shared native/torch loader
    behind `mlsp-tpu eval` and SPST's `--from_torch`."""

    def test_from_torch_file(self, tmp_path):
        from mlsp_tpu.train.state import create_train_state
        from mlsp_tpu.utils import checkpoint

        sd = make_reference_state_dict(np.random.default_rng(5))
        path = str(tmp_path / "model.pt")
        torch.save(sd, path)

        model = DGCNN(num_classes=10, k=20)
        state = create_train_state(
            model, jax.random.key(0), jnp.zeros((1, 64, 3), jnp.float32),
            heads=("defrec", "normal", "scan", "density"))
        new = checkpoint.load_model_weights(state, path, "dgcnn",
                                            from_torch=True)
        w = sd["conv2.conv.0.weight"].numpy().reshape(64, 128)
        np.testing.assert_allclose(
            new.params["EdgeConvM_1"]["w_diff"]["kernel"], w[:, :64].T)
        # Optimizer state untouched (fresh), step preserved.
        assert new.step == state.step

    def test_missing_file_raises(self, tmp_path):
        from mlsp_tpu.train.state import create_train_state
        from mlsp_tpu.utils import checkpoint

        model = DGCNN(num_classes=10, k=20)
        state = create_train_state(
            model, jax.random.key(0), jnp.zeros((1, 64, 3), jnp.float32),
            heads=("defrec",))
        with pytest.raises(FileNotFoundError):
            checkpoint.load_model_weights(state, str(tmp_path / "no.pt"),
                                          "dgcnn")

    def test_spst_missing_model_file_raises(self, tmp_path):
        from mlsp_tpu.train.spst import train_spst
        from mlsp_tpu.utils.config import SPSTConfig

        cfg = SPSTConfig(
            synthetic=True, out_path=str(tmp_path), exp_name="spst_missing",
            batch_size=8, num_points=64, model="pointnet",
            model_file=str(tmp_path / "absent.ckpt"),
        )
        with pytest.raises(FileNotFoundError):
            train_spst(cfg)


class TestAtomicUnits:
    def test_partial_bn_stays_at_init(self):
        """strict=False with a BN layer missing its running stats must
        leave that layer consistently at init — never checkpoint affine
        params paired with init running stats."""
        rng = np.random.default_rng(3)
        sd = make_reference_state_dict(rng)
        del sd["bn5.running_mean"]  # classification path BN, partial
        model = DGCNN(num_classes=10, k=20)
        variables = jax.jit(
            lambda r, x: model.init({"params": r}, x, train=False,
                                    heads=("defrec", "normal", "scan",
                                           "density"))
        )(jax.random.key(0), jnp.zeros((1, 64, 3), jnp.float32))
        with pytest.warns(UserWarning, match="bn5"):
            new = import_dgcnn(sd, variables, strict=False)
        bn = new["params"]["DenseBN_0"]["BatchNorm_0"]
        st = new["batch_stats"]["DenseBN_0"]["BatchNorm_0"]
        # whole unit at init: scale 1, bias 0, mean 0, var 1
        assert np.allclose(bn["scale"], 1.0) and np.allclose(bn["bias"], 0.0)
        assert np.allclose(st["mean"], 0.0) and np.allclose(st["var"], 1.0)
        # ...while the Dense kernel of the same block DID import
        assert np.allclose(
            np.asarray(new["params"]["DenseBN_0"]["Dense_0"]["kernel"]),
            np.asarray(sd["conv5.weight"]).reshape(1024, 512).T)
