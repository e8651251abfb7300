"""Differential parity vs the ACTUAL reference code (`/root/reference`).

The numpy oracles in `tests/oracles.py` are re-derived and could share a
misreading with the port; these tests instead run the reference's own
torch functions (with a `pcl` stub — only `cal_density` touches pcl and
it is not exercised here) and assert agreement to f32 tolerance.

Covered: `MLSP/mlsp.py` reconstruction_loss / findindexs /
normal_prediction_loss / calc_def_normal_loss / densityloss /
deform_densityloss, `MLSP/PCM.py` calc_loss, and
`utils/pc_utils.py` farthest_point_sample_np.

The reference layout is channels-first ([B, C, N] clouds, [B, C, N]
masks with identical rows); ours is channels-last ([B, N, 3]) with
[B, N] masks. Each test builds both layouts from one numpy draw.
"""

from __future__ import annotations

import sys
import types
from types import SimpleNamespace

import numpy as np
import pytest

torch = pytest.importorskip("torch")

# `MLSP/mlsp.py` imports `pcl` at module scope; stub it (only
# `cal_density` uses it, and these tests do not call that path).
sys.modules.setdefault("pcl", types.ModuleType("pcl"))
if "/root/reference" not in sys.path:
    sys.path.insert(0, "/root/reference")

mlsp = pytest.importorskip("MLSP.mlsp")
PCM = pytest.importorskip("MLSP.PCM")
ref_pc_utils = pytest.importorskip("utils.pc_utils")

import jax
import jax.numpy as jnp

from mlsp_tpu import losses as L
from mlsp_tpu import ops


def _rand_mask(rng, B, N, min_active=2):
    """0/1 mask with at least `min_active` active points per cloud (an
    all-zero mask hits the reference's 0/0 NaN; our port guards it —
    a deliberate, documented delta)."""
    m = (rng.random((B, N)) < 0.4).astype(np.float32)
    for b in range(B):
        idx = rng.choice(N, size=min_active, replace=False)
        m[b, idx] = 1.0
    return m


def _t(x):
    return torch.from_numpy(np.asarray(x))


def _cf(x):  # channels-first [B, C, N] torch view of a [B, N, C] array
    return _t(x).permute(0, 2, 1).contiguous()


def _mask3(mask):  # [B, N] -> torch [B, 3, N] (identical rows)
    return _t(np.repeat(mask[:, None, :], 3, axis=1))


class TestChamfer:
    def test_reconstruction_loss(self, rng):
        B, N = 4, 96
        pred = rng.standard_normal((B, N, 3)).astype(np.float32)
        gold = rng.standard_normal((B, N, 3)).astype(np.float32)
        mask = _rand_mask(rng, B, N)
        # reference: pred [B,N,3] (head output), gold/mask [B,3,N]
        want = mlsp.reconstruction_loss(_t(pred), _cf(gold), _mask3(mask))
        got = ops.reconstruction_loss(jnp.asarray(pred), jnp.asarray(gold), jnp.asarray(mask))
        np.testing.assert_allclose(float(got), float(want), rtol=1e-5, atol=1e-6)

    def test_calc_loss_scaler(self, rng):
        B, N = 2, 64
        pred = rng.standard_normal((B, N, 3)).astype(np.float32)
        gold = rng.standard_normal((B, N, 3)).astype(np.float32)
        mask = _rand_mask(rng, B, N)
        args = SimpleNamespace(DefRec_weight=0.5)
        want = mlsp.calc_loss(args, {"DefRec": _t(pred)}, _cf(gold), _mask3(mask))
        got = L.defrec_loss(jnp.asarray(pred), jnp.asarray(gold), jnp.asarray(mask), 0.5)
        np.testing.assert_allclose(float(got), float(want), rtol=1e-5, atol=1e-6)

    def test_findindexs(self, rng):
        B, N = 4, 80
        pred = rng.standard_normal((B, N, 3)).astype(np.float32)
        gold = rng.standard_normal((B, N, 3)).astype(np.float32)
        mask = _rand_mask(rng, B, N)
        i1_ref, i2_ref = mlsp.findindexs(_t(pred), _cf(gold), _mask3(mask))
        i1, i2 = ops.nearest_index_pair(jnp.asarray(pred), jnp.asarray(gold), jnp.asarray(mask))
        np.testing.assert_array_equal(np.asarray(i1), i1_ref.numpy())
        np.testing.assert_array_equal(np.asarray(i2), i2_ref.numpy())


class TestNormalLosses:
    def test_normal_prediction_loss(self, rng):
        B, N = 4, 128
        pred = rng.standard_normal((B, N, 3)).astype(np.float32)
        gt = rng.standard_normal((B, N, 3)).astype(np.float32)
        args = SimpleNamespace(normal_pred_weight=0.5)
        want = mlsp.calc_normal_loss(args, _t(pred), _t(gt))
        got = L.normal_loss(jnp.asarray(pred), jnp.asarray(gt), 0.5)
        np.testing.assert_allclose(float(got), float(want), rtol=1e-5, atol=1e-6)

    @pytest.mark.parametrize("defpart", [False, True])
    def test_calc_def_normal_loss(self, rng, defpart):
        B, N = 4, 96
        pred = rng.standard_normal((B, N, 3)).astype(np.float32)
        labels = rng.standard_normal((B, N, 3)).astype(np.float32)
        dx = rng.standard_normal((B, N, 3)).astype(np.float32)
        orig = rng.standard_normal((B, N, 3)).astype(np.float32)
        mask = _rand_mask(rng, B, N)
        args = SimpleNamespace(Density_normal_defpart=defpart, normal_pred_weight=0.5)

        idx_ref = mlsp.findindexs(_t(dx), _cf(orig), _mask3(mask))
        want = mlsp.calc_def_normal_loss(
            args, {"Normal": _t(pred)}, _t(labels), _mask3(mask), idx_ref, "cpu"
        )

        idx = ops.nearest_index_pair(jnp.asarray(dx), jnp.asarray(orig), jnp.asarray(mask))
        w = L.region_weights(jnp.asarray(mask), defpart)
        got = L.transported_normal_loss(
            jnp.asarray(pred), jnp.asarray(labels), w, idx, 0.5
        )
        np.testing.assert_allclose(float(got), float(want), rtol=1e-5, atol=1e-6)


class TestDensityLosses:
    def _draw(self, rng, B, N, C):
        logits = rng.standard_normal((B * N, C)).astype(np.float32)
        p_vec = np.exp(logits) / np.exp(logits).sum(-1, keepdims=True)
        p_val = (rng.random(B * N) * (C - 1) * 2).astype(np.float32)
        t_val = rng.integers(0, (C - 1) * 2 + 1, B * N).astype(np.float32)
        hot = rng.integers(0, C, B * N)
        t_vec = (np.eye(C, dtype=np.float32)[hot] + np.eye(C, dtype=np.float32)[np.minimum(hot + 1, C - 1)]) / 2
        return p_vec, p_val, t_vec, t_val

    @pytest.mark.parametrize("masked", [False, True])
    def test_densityloss(self, rng, masked):
        B, N, C = 3, 64, 16
        p_vec, p_val, t_vec, t_val = self._draw(rng, B, N, C)
        mask = _rand_mask(rng, B, N).reshape(-1) if masked else None
        args = SimpleNamespace(Density_weight=0.05)
        kl_ref, mae_ref = mlsp.densityloss(
            args,
            {"density": _t(p_vec), "density_mse": _t(p_val)},
            _t(t_val),
            _t(t_vec),
            mask=_t(mask) if masked else None,
        )
        kl, mae = L.density_loss(
            jnp.asarray(p_vec), jnp.asarray(p_val), jnp.asarray(t_vec),
            jnp.asarray(t_val), 0.05,
            mask=jnp.asarray(mask) if masked else None,
        )
        np.testing.assert_allclose(float(kl), float(kl_ref), rtol=1e-5, atol=1e-7)
        np.testing.assert_allclose(float(mae), float(mae_ref), rtol=1e-5, atol=1e-7)

    @pytest.mark.parametrize("defpart", [False, True])
    def test_deform_densityloss(self, rng, defpart):
        B, N, C = 3, 64, 16
        p_vec, p_val, t_vec, t_val = self._draw(rng, B, N, C)
        dx = rng.standard_normal((B, N, 3)).astype(np.float32)
        orig = rng.standard_normal((B, N, 3)).astype(np.float32)
        mask = _rand_mask(rng, B, N)
        args = SimpleNamespace(
            Density_normal_defpart=defpart, density_num_class=C, Density_weight=0.05
        )

        idx_ref = mlsp.findindexs(_t(dx), _cf(orig), _mask3(mask))
        kl_ref, mae_ref = mlsp.deform_densityloss(
            args,
            {"density": _t(p_vec), "density_mse": _t(p_val)},
            _t(t_vec),
            _t(t_val.reshape(B, N)),
            _mask3(mask),
            idx_ref,
            "cpu",
        )

        idx = ops.nearest_index_pair(jnp.asarray(dx), jnp.asarray(orig), jnp.asarray(mask))
        w = L.region_weights(jnp.asarray(mask), defpart)
        kl, mae = L.transported_density_loss(
            jnp.asarray(p_vec).reshape(B, N, C),
            jnp.asarray(p_val).reshape(B, N),
            jnp.asarray(t_vec).reshape(B, N, C),
            jnp.asarray(t_val).reshape(B, N),
            w, idx, 0.05,
        )
        np.testing.assert_allclose(float(kl), float(kl_ref), rtol=1e-5, atol=1e-7)
        np.testing.assert_allclose(float(mae), float(mae_ref), rtol=1e-5, atol=1e-7)


class TestPCM:
    def test_calc_loss(self, rng):
        B, Ccls = 8, 10
        logits = rng.standard_normal((B, Ccls)).astype(np.float32)
        ya = rng.integers(0, Ccls, B)
        yb = rng.integers(0, Ccls, B)
        lam = 0.37
        args = SimpleNamespace(DefRec_weight=0.5)
        want = PCM.calc_loss(
            args, {"cls": _t(logits)}, (_t(ya), _t(yb), lam),
            torch.nn.CrossEntropyLoss(),
        )
        got = L.mixup_cross_entropy(
            jnp.asarray(logits), jnp.asarray(ya), jnp.asarray(yb), lam, 0.5
        )
        np.testing.assert_allclose(float(got), float(want), rtol=1e-5, atol=1e-6)


def _stub_reference_model_deps():
    """PointDA/Models.py imports CUDA-only deps at module scope; stub them
    (PointNet/DGCNN forward paths never touch them on CPU)."""
    knn_cuda = types.ModuleType("knn_cuda")
    knn_cuda.KNN = object
    sys.modules.setdefault("knn_cuda", knn_cuda)
    p2o = types.ModuleType("pointnet2_ops")
    p2o.pointnet2_utils = types.ModuleType("pointnet2_ops.pointnet2_utils")
    sys.modules.setdefault("pointnet2_ops", p2o)
    sys.modules.setdefault("pointnet2_ops.pointnet2_utils", p2o.pointnet2_utils)
    try:
        import timm  # noqa: F401
    except ImportError:
        t = types.ModuleType("timm")
        tm = types.ModuleType("timm.models")
        tl = types.ModuleType("timm.models.layers")
        tl.DropPath = object
        tl.trunc_normal_ = lambda *a, **k: None
        t.models, tm.layers = tm, tl
        sys.modules.update(
            {"timm": t, "timm.models": tm, "timm.models.layers": tl})
    if "/root/reference/PointDA" not in sys.path:
        sys.path.insert(0, "/root/reference/PointDA")


_stub_reference_model_deps()
refM = pytest.importorskip("PointDA.Models")
refSegM = pytest.importorskip("PointSegDA.Models")

from mlsp_tpu.models import DGCNN, DGCNNSeg, PointNet
from mlsp_tpu.utils.torch_import import (
    CheckpointMismatchError,
    import_dgcnn,
    import_dgcnn_seg,
    import_pointnet,
)


def _ref_args(model="dgcnn"):
    return SimpleNamespace(
        num_class=10, dropout=0.5, model=model, encoder_type="", cuda=False,
        density_num_class=16, pergroup=2.0, gpus=[-1],
    )


def _init_flax(model, heads, N=64):
    return jax.jit(
        lambda r, x: model.init({"params": r}, x, train=False, heads=heads)
    )(jax.random.key(0), jnp.zeros((1, N, 3), jnp.float32))


class TestForwardEquivalence:
    """Full forward equality vs the reference's own torch modules through a
    state_dict import — the strongest offline accuracy-parity evidence."""

    B, N = 3, 64

    def _cloud(self, rng):
        return rng.standard_normal((self.B, self.N, 3)).astype(np.float32)

    def test_pointnet(self, rng):
        torch.manual_seed(0)
        ref = refM.PointNet(_ref_args("pointnet")).eval()
        x = self._cloud(rng)
        with torch.no_grad():
            want = ref(_cf(x), activate_DefRec=True)

        model = PointNet(num_classes=10)
        v = import_pointnet(ref.state_dict(), _init_flax(model, ("defrec",)))
        got = model.apply(v, jnp.asarray(x), train=False, heads=("defrec",))
        np.testing.assert_allclose(
            np.asarray(got["cls"]), want["cls"].numpy(), rtol=1e-4, atol=1e-4)
        np.testing.assert_allclose(
            np.asarray(got["defrec"]), want["DefRec"].numpy(), rtol=1e-4, atol=1e-4)

    def test_dgcnn(self, rng):
        torch.manual_seed(1)
        ref = refM.DGCNN(_ref_args("dgcnn")).eval()
        x = self._cloud(rng)
        with torch.no_grad():
            want = ref(_cf(x), activate_DefRec=True, activate_normal=True,
                       activate_scan=True, activate_density=True)

        heads = ("defrec", "normal", "scan", "density")
        model = DGCNN(num_classes=10, k=20)
        v = import_dgcnn(ref.state_dict(), _init_flax(model, heads))
        got = model.apply(v, jnp.asarray(x), train=False, heads=heads)
        B, N = self.B, self.N
        for ours, theirs in (("cls", "cls"), ("defrec", "DefRec"),
                             ("normal", "Normal"), ("scan", "Rec_scan")):
            np.testing.assert_allclose(
                np.asarray(got[ours]), want[theirs].numpy(),
                rtol=1e-4, atol=1e-4, err_msg=ours)
        np.testing.assert_allclose(
            np.asarray(got["density"]).reshape(B * N, -1),
            want["density"].numpy(), rtol=1e-4, atol=1e-4)
        np.testing.assert_allclose(
            np.asarray(got["density_mse"]).reshape(-1),
            want["density_mse"].numpy(), rtol=1e-4, atol=1e-4)

    def test_dgcnn_seg(self, rng):
        torch.manual_seed(2)
        args = _ref_args("dgcnn")
        args.pergroup = 5.0
        ref = refSegM.DGCNN_DefRec(args, in_size=3, num_classes=8).eval()
        x = self._cloud(rng)
        with torch.no_grad():
            want = ref(_cf(x), make_seg=True, activate_DefRec=True,
                       activate_normal=True, activate_density=True)

        heads = ("seg", "defrec", "normal", "density")
        model = DGCNNSeg(num_classes=8, k=20, pergroup=5.0)
        v = import_dgcnn_seg(ref.state_dict(), _init_flax(model, heads),
                             pergroup=5.0)
        got = model.apply(v, jnp.asarray(x), train=False, heads=heads)
        B, N = self.B, self.N
        for ours, theirs in (("seg", "seg"), ("defrec", "DefRec"),
                             ("normal", "Normal")):
            np.testing.assert_allclose(
                np.asarray(got[ours]), want[theirs].numpy(),
                rtol=1e-4, atol=1e-4, err_msg=ours)
        np.testing.assert_allclose(
            np.asarray(got["density"]).reshape(B * N, -1),
            want["density"].numpy(), rtol=1e-4, atol=1e-4)
        np.testing.assert_allclose(
            np.asarray(got["density_mse"]).reshape(-1),
            want["density_mse"].numpy(), rtol=1e-4, atol=1e-4)


class TestHengshuangBlock:
    """`VectorAttention` vs the reference's own `TransformerBlock`
    (`hengshuang_transformer/transformer.py:7-44`, pure torch) with
    copied weights — catches softmax-scaling/pos-encoding misreadings."""

    def test_vector_attention_matches_reference(self, rng):
        ref_tr = pytest.importorskip(
            "PointDA.hengshuang_transformer.transformer")
        from mlsp_tpu.models.hengshuang import VectorAttention

        B, N, C, D, k = 2, 48, 16, 24, 8
        torch.manual_seed(3)
        ref = ref_tr.TransformerBlock(C, D, k).eval()
        xyz = rng.standard_normal((B, N, 3)).astype(np.float32)
        feats = rng.standard_normal((B, N, C)).astype(np.float32)
        with torch.no_grad():
            want, _ = ref(_t(xyz), _t(feats))

        sd = ref.state_dict()

        def kern(name):
            return jnp.asarray(sd[name + ".weight"].numpy().T)

        def bias(name):
            return jnp.asarray(sd[name + ".bias"].numpy())

        # VectorAttention Dense construction order: fc1, w_qs, w_ks, w_vs,
        # fc_delta (OUTER first — in `f(g(x))` Python constructs f before
        # g, and flax numbers by construction), fc_gamma (outer, inner),
        # fc2.
        params = {
            "Dense_0": {"kernel": kern("fc1"), "bias": bias("fc1")},
            "Dense_1": {"kernel": kern("w_qs")},
            "Dense_2": {"kernel": kern("w_ks")},
            "Dense_3": {"kernel": kern("w_vs")},
            "Dense_4": {"kernel": kern("fc_delta.2"), "bias": bias("fc_delta.2")},
            "Dense_5": {"kernel": kern("fc_delta.0"), "bias": bias("fc_delta.0")},
            "Dense_6": {"kernel": kern("fc_gamma.2"), "bias": bias("fc_gamma.2")},
            "Dense_7": {"kernel": kern("fc_gamma.0"), "bias": bias("fc_gamma.0")},
            "Dense_8": {"kernel": kern("fc2"), "bias": bias("fc2")},
        }
        m = VectorAttention(D, k)
        ref_shapes = jax.tree_util.tree_map(
            jnp.shape,
            m.init({"params": jax.random.key(0)}, jnp.asarray(xyz),
                   jnp.asarray(feats), False)["params"])
        assert ref_shapes == jax.tree_util.tree_map(jnp.shape, params)
        got = m.apply({"params": params}, jnp.asarray(xyz),
                      jnp.asarray(feats), False)
        np.testing.assert_allclose(np.asarray(got), want.numpy(),
                                   rtol=1e-4, atol=1e-4)


class TestGroupEncoders:
    """`GroupEncoder` / `RelativeGroupEncoder` vs the reference's own
    `Encoder` / `Relative_Encoder` (`model_utils.py:292-399`, pure torch)
    with copied weights: proves the sum-of-Dense concat decompositions
    (incl. the hardcoded `add_conv1` stage and the 515-channel
    relative-coord re-concat) are bit-exact."""

    B, G, M = 2, 6, 16

    def _groups(self, rng):
        rel = rng.standard_normal((self.B, self.G, self.M, 3)).astype(np.float32)
        centers = rng.standard_normal((self.B, self.G, 3)).astype(np.float32)
        return rel, centers

    @staticmethod
    def _randomize_bn(ref):
        with torch.no_grad():
            for m in ref.modules():
                if isinstance(m, torch.nn.BatchNorm1d):
                    m.running_mean.normal_(0, 0.5)
                    m.running_var.uniform_(0.5, 1.5)

    @staticmethod
    def _k(sd, name, cols=None):
        """conv1d kernel [out, in, 1] -> flax [in, out], optionally a
        column slice of the input dim (concat split)."""
        w = sd[name + ".weight"].numpy()
        w = w.reshape(w.shape[0], w.shape[1])
        if cols is not None:
            w = w[:, cols]
        return jnp.asarray(w.T)

    @staticmethod
    def _b(sd, name):
        return jnp.asarray(sd[name + ".bias"].numpy())

    @classmethod
    def _bn(cls, sd, prefix):
        params = {"scale": jnp.asarray(sd[prefix + ".weight"].numpy()),
                  "bias": jnp.asarray(sd[prefix + ".bias"].numpy())}
        stats = {"mean": jnp.asarray(sd[prefix + ".running_mean"].numpy()),
                 "var": jnp.asarray(sd[prefix + ".running_var"].numpy())}
        return params, stats

    def test_group_encoder_matches_encoder(self, rng):
        from PointDA.model_utils import Encoder

        from mlsp_tpu.models.transformer import GroupEncoder

        torch.manual_seed(4)
        ref = Encoder(encoder_channel=48).eval()
        self._randomize_bn(ref)
        rel, _ = self._groups(rng)
        with torch.no_grad():
            want = ref(_t(rel))

        sd, k, b, bn = ref.state_dict(), self._k, self._b, self._bn
        fbn_p, fbn_s = bn(sd, "first_conv.1")
        a1bn_p, a1bn_s = bn(sd, "add_conv1.1")
        s2bn_p, s2bn_s = bn(sd, "second_conv.1")
        g256 = slice(0, 256)
        h256 = slice(256, 512)
        params = {
            "DenseBN_0": {"Dense_0": {"kernel": k(sd, "first_conv.0"),
                                      "bias": b(sd, "first_conv.0")},
                          "BatchNorm_0": fbn_p},
            "Dense_0": {"kernel": k(sd, "first_conv.3"),
                        "bias": b(sd, "first_conv.3")},
            # add_conv1: cat order [global | h] (model_utils.py:328-334)
            "Dense_1": {"kernel": k(sd, "add_conv1.0", g256),
                        "bias": b(sd, "add_conv1.0")},
            "Dense_2": {"kernel": k(sd, "add_conv1.0", h256)},
            "BatchNorm_0": a1bn_p,
            "Dense_3": {"kernel": k(sd, "add_conv1.3"),
                        "bias": b(sd, "add_conv1.3")},
            "Dense_4": {"kernel": k(sd, "second_conv.0", g256),
                        "bias": b(sd, "second_conv.0")},
            "Dense_5": {"kernel": k(sd, "second_conv.0", h256)},
            "BatchNorm_1": s2bn_p,
            "Dense_6": {"kernel": k(sd, "second_conv.3"),
                        "bias": b(sd, "second_conv.3")},
        }
        stats = {"DenseBN_0": {"BatchNorm_0": fbn_s},
                 "BatchNorm_0": a1bn_s, "BatchNorm_1": s2bn_s}

        m = GroupEncoder(48)
        v0 = m.init({"params": jax.random.key(0)}, jnp.asarray(rel), False)
        assert (jax.tree_util.tree_map(jnp.shape, v0["params"])
                == jax.tree_util.tree_map(jnp.shape, params))
        got = m.apply({"params": params, "batch_stats": stats},
                      jnp.asarray(rel), False)
        np.testing.assert_allclose(np.asarray(got), want.numpy(),
                                   rtol=1e-4, atol=1e-4)

    def test_relative_encoder_matches_reference(self, rng):
        from PointDA.model_utils import Relative_Encoder

        from mlsp_tpu.models.vit import RelativeGroupEncoder

        torch.manual_seed(5)
        ref = Relative_Encoder(encoder_channel=48).eval()
        self._randomize_bn(ref)
        rel, centers = self._groups(rng)
        absolute = rel + centers[:, :, None, :]
        with torch.no_grad():
            want = ref(_t(absolute), _t(centers))

        sd, k, b, bn = ref.state_dict(), self._k, self._b, self._bn
        fbn_p, fbn_s = bn(sd, "first_conv.1")
        a1bn_p, a1bn_s = bn(sd, "add_conv1.1")
        s2bn_p, s2bn_s = bn(sd, "second_conv.1")
        # 515-channel cat order: [global(256) | h(256) | rel(3)]
        # (model_utils.py:386-396).
        g256, h256, r3 = slice(0, 256), slice(256, 512), slice(512, 515)
        params = {
            "Dense_0": {"kernel": k(sd, "first_conv.0"),
                        "bias": b(sd, "first_conv.0")},
            "BatchNorm_0": fbn_p,
            "Dense_1": {"kernel": k(sd, "first_conv.3"),
                        "bias": b(sd, "first_conv.3")},
            "Dense_2": {"kernel": k(sd, "add_conv1.0", g256),
                        "bias": b(sd, "add_conv1.0")},
            "Dense_3": {"kernel": k(sd, "add_conv1.0", h256)},
            "Dense_4": {"kernel": k(sd, "add_conv1.0", r3)},
            "BatchNorm_1": a1bn_p,
            "Dense_5": {"kernel": k(sd, "add_conv1.3"),
                        "bias": b(sd, "add_conv1.3")},
            "Dense_6": {"kernel": k(sd, "second_conv.0", g256),
                        "bias": b(sd, "second_conv.0")},
            "Dense_7": {"kernel": k(sd, "second_conv.0", h256)},
            "Dense_8": {"kernel": k(sd, "second_conv.0", r3)},
            "BatchNorm_2": s2bn_p,
            "Dense_9": {"kernel": k(sd, "second_conv.3"),
                        "bias": b(sd, "second_conv.3")},
        }
        stats = {"BatchNorm_0": fbn_s, "BatchNorm_1": a1bn_s,
                 "BatchNorm_2": s2bn_s}

        m = RelativeGroupEncoder(48)
        v0 = m.init({"params": jax.random.key(0)}, jnp.asarray(rel),
                    jnp.asarray(centers), False)
        assert (jax.tree_util.tree_map(jnp.shape, v0["params"])
                == jax.tree_util.tree_map(jnp.shape, params))
        got = m.apply({"params": params, "batch_stats": stats},
                      jnp.asarray(rel), jnp.asarray(centers), False)
        np.testing.assert_allclose(np.asarray(got), want.numpy(),
                                   rtol=1e-4, atol=1e-4)


class TestImportDiagnostics:
    """Missing/unexpected/shape reporting parity with the reference's
    `utils/checkpoint.py:16-134`."""

    def _ref_sd(self):
        torch.manual_seed(3)
        return refM.PointNet(_ref_args("pointnet")).state_dict()

    def test_missing_keys_reported(self):
        sd = self._ref_sd()
        removed = [k for k in sd if k.startswith("C.mlp1")]
        for k in removed:
            del sd[k]
        v = _init_flax(PointNet(num_classes=10), ("defrec",))
        with pytest.raises(CheckpointMismatchError) as ei:
            import_pointnet(sd, v)
        assert "not found in the checkpoint" in str(ei.value)
        assert "C.mlp1" in str(ei.value)

    def test_unexpected_keys_warn(self):
        sd = self._ref_sd()
        sd["extra_module.weight"] = torch.zeros(3, 3)
        v = _init_flax(PointNet(num_classes=10), ("defrec",))
        with pytest.warns(UserWarning, match="not used by the model"):
            import_pointnet(sd, v)

    def test_shape_mismatch_reported(self):
        sd = self._ref_sd()
        sd["C.mlp3.weight"] = torch.zeros(7, 256)  # wrong num_class
        v = _init_flax(PointNet(num_classes=10), ("defrec",))
        with pytest.raises(CheckpointMismatchError, match="mismatched shapes"):
            import_pointnet(sd, v)

    def test_non_strict_maps_partially(self):
        sd = self._ref_sd()
        for k in [k for k in sd if k.startswith("DefRec")]:
            del sd[k]
        v = _init_flax(PointNet(num_classes=10), ("defrec",))
        out = import_pointnet(sd, v, strict=False)
        np.testing.assert_allclose(
            out["params"]["Classifier_0"]["Dense_0"]["kernel"],
            sd["C.mlp3.weight"].numpy().T)


class TestFPS:
    def test_fps_matches_reference_numpy(self, rng):
        """ops.fps == the reference's own FPS recursion
        (`utils/pc_utils.py:164-187`), same start indices."""
        B, N, S = 4, 128, 48
        x = rng.standard_normal((B, N, 3)).astype(np.float32)
        np.random.seed(7)  # ref draws its own start internally
        idx_ref, _ = ref_pc_utils.farthest_point_sample_np(
            x.transpose(0, 2, 1).astype(np.float64), S
        )
        start = idx_ref[:, 0].astype(np.int32)
        got = ops.fps(jnp.asarray(x), S, jnp.asarray(start))
        np.testing.assert_array_equal(np.asarray(got), idx_ref)
