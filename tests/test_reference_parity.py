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

    class _FakeKNN:  # instantiable (PointTransformer builds KNN objects
        def __init__(self, *a, **k):  # at __init__ time), never callable
            pass

        def __call__(self, *a, **k):
            raise RuntimeError("KNN_CUDA stub: CPU tests must bypass it")

    knn_cuda.KNN = _FakeKNN
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


@pytest.mark.slow
class TestCollapseToPoint:
    """`volume_based_radius` deformation vs the reference's own
    `pc_utils.collapse_to_point` (dispatched by `MLSP/mlsp.py:33-35`).

    The reference picks uniformly (`np.random.choice`) among points with
    >= MIN_POINTS neighbours within RADIUS and collapses that
    neighbourhood to a gaussian blob (cov 0.001*I) around the point.
    """

    def _cloud(self, rng, N):
        x = rng.standard_normal((N, 3)).astype(np.float32)
        x -= x.mean(0)
        return x / np.linalg.norm(x, axis=-1).max()

    def test_mask_matches_reference(self, rng):
        from mlsp_tpu.ops.pairwise import self_sqdist
        from mlsp_tpu.transforms import deform

        N = 128
        for seed in range(4):
            x = self._cloud(rng, N)
            within = np.asarray(self_sqdist(jnp.asarray(x[None])))[0] <= deform.RADIUS**2
            eligible = np.flatnonzero(within.sum(-1) >= deform.RADIUS_MIN_POINTS)
            assert len(eligible) >= 2, "fixture degenerate"

            # The reference's only np.random call before the pick is the
            # pick itself, so seeding lets us predict it FROM OUR OWN
            # eligibility set: if the two implementations' eligible sets
            # differed, the replayed choice would (a.s.) name a different
            # centre and the replaced-set equality below would fail.
            np.random.seed(seed)
            pick = np.random.choice(eligible)

            np.random.seed(seed)
            tx = torch.from_numpy(x.T.copy())
            out_t, idx_t = ref_pc_utils.collapse_to_point(tx, "cpu")
            replaced = np.zeros(N, bool)
            replaced[idx_t.numpy()] = True
            np.testing.assert_array_equal(
                replaced, within[pick],
                err_msg="reference replaced-set != our neighbourhood mask")

            # blob statistics: gaussian around the ORIGINAL picked point
            blob = out_t.numpy().T[replaced] - x[pick]
            n = replaced.sum()
            assert np.abs(blob.mean(0)).max() < 5 * deform.GAUSS_STD / np.sqrt(n)
            assert abs(blob.std() / deform.GAUSS_STD - 1.0) < 0.4

    def test_pick_uniform_and_blob_ours(self, rng):
        """Our side: every draw collapses the neighbourhood of an
        eligible point, the centre is ~uniform over the eligible set
        (matching `np.random.choice`), and the blob is the same
        gaussian."""
        from mlsp_tpu.ops.pairwise import self_sqdist
        from mlsp_tpu.transforms import deform

        N, DRAWS = 96, 150
        x = self._cloud(rng, N)
        within = np.asarray(self_sqdist(jnp.asarray(x[None])))[0] <= deform.RADIUS**2
        eligible = np.flatnonzero(within.sum(-1) >= deform.RADIUS_MIN_POINTS)
        K = len(eligible)
        assert K >= 2

        xb = jnp.asarray(np.repeat(x[None], 2, 0))  # batched entry point
        counts = np.zeros(N)
        blobs = []
        for d in range(DRAWS // 2):
            out, mask = deform.collapse_to_point_batch(jax.random.key(d), xb)
            out, mask = np.asarray(out), np.asarray(mask) > 0
            for b in range(2):
                # the centre is the unique eligible point whose
                # neighbourhood row equals the mask
                cands = [p for p in eligible
                         if np.array_equal(mask[b], within[p])]
                assert cands, "mask is not an eligible neighbourhood"
                counts[cands[0]] += 1
                blobs.append(out[b][mask[b]] - x[cands[0]])
                np.testing.assert_array_equal(out[b][~mask[b]], x[~mask[b]])
        assert counts[np.setdiff1d(np.arange(N), eligible)].sum() == 0
        # uniformity over the eligible set: each frequency within 4
        # sigma of 1/K (binomial)
        p = 1.0 / K
        sig = np.sqrt(p * (1 - p) / DRAWS)
        assert np.abs(counts[eligible] / DRAWS - p).max() < 4 * sig + 0.02
        blob = np.concatenate(blobs)
        assert np.abs(blob.mean(0)).max() < 5 * deform.GAUSS_STD / np.sqrt(len(blob))
        assert abs(blob.std() / deform.GAUSS_STD - 1.0) < 0.1


@pytest.mark.slow
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


@pytest.mark.slow
class TestPointTransformerImport:
    """Reference `PointTransformer` checkpoint -> our model: full
    cls-path forward equivalence through `import_point_transformer`
    (`Models.py:370-531`; the CUDA grouping is bypassed identically on
    both sides — FPS/kNN parity is covered elsewhere)."""

    B, N, G, M, D, E, HEADS, DEPTH = 2, 128, 16, 8, 96, 64, 4, 4

    def _config(self):
        return SimpleNamespace(
            trans_dim=self.D, depth=self.DEPTH, drop_path_rate=0.0,
            cls_dim=10, num_heads=self.HEADS, group_size=self.M,
            num_group=self.G, encoder_dims=self.E, encoder_type="Encoder",
            dropout=0.5, model="transformer",
        )

    def test_forward_matches_reference(self, rng):
        from mlsp_tpu.models.transformer import (
            PointTransformer, group_points_knn,
        )
        from mlsp_tpu.utils.torch_import import import_point_transformer

        torch.manual_seed(21)
        ref = refM.PointTransformer(self._config()).eval()
        x = rng.standard_normal((self.B, self.N, 3)).astype(np.float32)

        # identical grouping on both sides (the torch Group needs
        # KNN_CUDA; our FPS/kNN parity is tested separately)
        neigh, centers = group_points_knn(
            jnp.asarray(x), self.G, self.M,
            jnp.zeros((self.B,), jnp.int32))
        class _FixedGroup(torch.nn.Module):
            def forward(self, pts):
                return _t(np.asarray(neigh)), _t(np.asarray(centers))

        ref.group_divider = _FixedGroup()
        with torch.no_grad():
            want = ref(_t(x), activate_DefRec=False)

        model = PointTransformer(
            num_classes=10, trans_dim=self.D, depth=self.DEPTH,
            heads=self.HEADS, num_group=self.G, group_size=self.M,
            encoder_dims=self.E)
        v0 = jax.jit(lambda r, xx: model.init({"params": r}, xx,
                                              train=False))(
            jax.random.key(0), jnp.zeros((1, self.N, 3), jnp.float32))
        with pytest.warns(UserWarning, match="not used by the model"):
            # DefRec pyramid (propagation_*/dgcnn_pro_*) is redesigned
            # here and intentionally unmapped
            v = import_point_transformer(ref.state_dict(), v0)
        got = model.apply(v, jnp.asarray(x), train=False)
        np.testing.assert_allclose(np.asarray(got["cls"]), want.numpy(),
                                   rtol=1e-4, atol=1e-4)

    def test_pretrain_prefix_surgery(self, tmp_path):
        """Point-BERT-style checkpoints load through the reference's
        exact prefix rules (`Models.py:447-455`): transformer_q.* kept
        (except cls_head), module. stripped, everything else dropped."""
        from mlsp_tpu.models.transformer import PointTransformer
        from mlsp_tpu.utils.torch_import import (
            load_reference_point_transformer,
        )

        torch.manual_seed(22)
        ref = refM.PointTransformer(self._config())
        sd = ref.state_dict()
        wrapped = {"base_model": {}}
        for k, v_ in sd.items():
            wrapped["base_model"]["module.transformer_q." + k] = v_
        # a cls_head under transformer_q must be DROPPED by the surgery
        wrapped["base_model"]["transformer_q.cls_head.weight"] = (
            torch.zeros(2, 2))
        path = str(tmp_path / "pretrain.pth")
        torch.save(wrapped, path)

        model = PointTransformer(
            num_classes=10, trans_dim=self.D, depth=self.DEPTH,
            heads=self.HEADS, num_group=self.G, group_size=self.M,
            encoder_dims=self.E)
        v0 = jax.jit(lambda r, xx: model.init({"params": r}, xx,
                                              train=False))(
            jax.random.key(0), jnp.zeros((1, self.N, 3), jnp.float32))
        with pytest.warns(UserWarning):
            v = load_reference_point_transformer(path, v0)
        # backbone transferred...
        np.testing.assert_allclose(
            np.asarray(v["params"]["reduce_dim"]["kernel"]),
            sd["reduce_dim.weight"].numpy().T)
        np.testing.assert_allclose(
            np.asarray(v["params"]["cls_token"]), sd["cls_token"].numpy())


class TestFromTorchWiring:
    """`checkpoint.load_model_weights(..., from_torch=True)` — the
    eval/SPST/export CLI path — reaches the transformer-family loaders."""

    def test_point_transformer_via_load_model_weights(self, tmp_path):
        from mlsp_tpu.models.transformer import PointTransformer
        from mlsp_tpu.train.state import create_train_state
        from mlsp_tpu.utils import checkpoint

        cfg = SimpleNamespace(
            trans_dim=96, depth=2, drop_path_rate=0.0, cls_dim=10,
            num_heads=4, group_size=8, num_group=16, encoder_dims=64,
            encoder_type="Encoder", dropout=0.5, model="transformer")
        torch.manual_seed(51)
        ref = refM.PointTransformer(cfg)
        path = str(tmp_path / "model.pt")
        torch.save(ref.state_dict(), path)

        model = PointTransformer(num_classes=10, trans_dim=96, depth=2,
                                 heads=4, num_group=16, group_size=8,
                                 encoder_dims=64, fetch_idx=(1,))
        state = create_train_state(
            model, jax.random.key(0), jnp.zeros((1, 128, 3), jnp.float32))
        with pytest.warns(UserWarning):  # DefRec pyramid keys unmapped
            state2 = checkpoint.load_model_weights(
                state, path, "point_transformer", from_torch=True)
        np.testing.assert_allclose(
            np.asarray(state2.params["reduce_dim"]["kernel"]),
            ref.state_dict()["reduce_dim.weight"].numpy().T)


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


@pytest.mark.slow
class TestHengshuangImport:
    """Reference hengshuang checkpoints -> our models: full forward
    equivalence through `import_hengshuang` (Def variant cls+DefRec,
    Seg variant), with the reference's random-start FPS pinned to the
    same start-0 convention our `ops.fps` uses."""

    B, N, NB, K, DM = 2, 256, 4, 8, 64

    def _cfg(self):
        cfg = SimpleNamespace(
            num_point=self.N, nblocks=self.NB, nneighbor=self.K,
            num_class=10, input_dim=3, transformer_dim=self.DM, dropout=0.5)
        cfg.model = cfg  # Seg reads cfg.model.nblocks, Backbone cfg.nblocks
        return cfg

    @staticmethod
    def _pin_fps(monkeypatch):
        from torch_fixtures import pin_reference_fps

        pin_reference_fps(monkeypatch)

    def test_def_variant_forward(self, rng, monkeypatch):
        ref_hm = pytest.importorskip(
            "PointDA.hengshuang_transformer.hengshuang_model")
        from mlsp_tpu.models.hengshuang import HengshuangTransformer
        from mlsp_tpu.utils.torch_import import import_hengshuang

        self._pin_fps(monkeypatch)
        torch.manual_seed(31)
        ref = ref_hm.PointTransformerDef(self._cfg()).eval()
        x = rng.standard_normal((self.B, self.N, 3)).astype(np.float32)
        with torch.no_grad():
            want_cls = ref(_t(x), activate_DefRec=False)
            want_def = ref(_t(x), activate_DefRec=True)

        model = HengshuangTransformer(
            num_classes=10, nblocks=self.NB, nneighbor=self.K,
            d_model=self.DM)
        v0 = jax.jit(lambda r, xx: model.init(
            {"params": r}, xx, train=False, heads=("defrec",)))(
            jax.random.key(0), jnp.zeros((1, self.N, 3), jnp.float32))
        v = import_hengshuang(ref.state_dict(), v0, nblocks=self.NB)
        got = model.apply(v, jnp.asarray(x), train=False, heads=("defrec",))
        np.testing.assert_allclose(np.asarray(got["cls"]),
                                   want_cls.numpy(), rtol=1e-4, atol=1e-4)
        np.testing.assert_allclose(np.asarray(got["defrec"]),
                                   want_def.numpy(), rtol=1e-4, atol=2e-4)

    def test_seg_variant_forward(self, rng, monkeypatch):
        ref_hm = pytest.importorskip(
            "PointDA.hengshuang_transformer.hengshuang_model")
        from mlsp_tpu.models.hengshuang import HengshuangSeg
        from mlsp_tpu.utils.torch_import import import_hengshuang

        self._pin_fps(monkeypatch)
        torch.manual_seed(32)
        ref = ref_hm.PointTransformerSeg(self._cfg()).eval()
        x = rng.standard_normal((self.B, self.N, 3)).astype(np.float32)
        with torch.no_grad():
            want = ref(_t(x))

        model = HengshuangSeg(num_classes=10, nblocks=self.NB,
                              nneighbor=self.K, d_model=self.DM)
        v0 = jax.jit(lambda r, xx: model.init(
            {"params": r}, xx, train=False, heads=("seg",)))(
            jax.random.key(0), jnp.zeros((1, self.N, 3), jnp.float32))
        v = import_hengshuang(ref.state_dict(), v0, nblocks=self.NB)
        got = model.apply(v, jnp.asarray(x), train=False, heads=("seg",))
        np.testing.assert_allclose(np.asarray(got["seg"]), want.numpy(),
                                   rtol=1e-4, atol=1e-4)


@pytest.mark.slow
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


@pytest.mark.slow
class TestTrajectory:
    """Multi-step train-TRAJECTORY differential vs the reference trainer.

    Forward/per-loss parity does not test the composition — optimizer
    update, BN-momentum threading across the multiple forwards per
    iteration, schedule stepping. This runs the PRODUCTION
    `steps.pointda_train_step` and a faithful torch replication of the
    reference iteration (`PointDA/trainer.py:341-574`, branch order
    source-cls -> Scan_on_trgt -> Density_normal_viainput) from IDENTICAL
    initial weights on IDENTICAL batches for 2 'epochs' x 3 iterations
    (torch `scheduler.step()` per epoch), asserting per-branch losses
    and post-Adam parameters (incl. BN running stats) track step by
    step.

    Randomness: dropout=0 on both sides (the one stream that cannot be
    injected across frameworks); the augment/deform draws and the
    on-device normal/density labels the torch side consumes are the
    jitted step's own (`cfg.debug_aux` returns them) — bit-exact, since
    an eager replay of the same PRNG keys can differ in last-ulp
    rotations and flip a voxel-boundary deform-region choice discretely.
    """

    # N=256: deform_input only deforms regions holding >= 40 points
    # (`mlsp.py:27,41`) — smaller clouds never qualify and the
    # reference's own DefRec loss degenerates to 0/0.
    B, N, EPOCHS, ITERS = 4, 256, 2, 3

    def _torch_args(self):
        return SimpleNamespace(
            num_class=10, dropout=0.0, model="dgcnn", encoder_type="",
            cuda=False, gpus=[-1], density_num_class=16, pergroup=2.0,
            DefRec_weight=0.5, normal_pred_weight=0.5, Scan_Rec_weight=0.5,
            Density_weight=0.05, Density_normal_defpart=False,
        )

    def test_pointda_train_trajectory(self, rng):
        import torch.nn.functional as F

        from mlsp_tpu.models import DGCNN
        from mlsp_tpu.train import steps
        from mlsp_tpu.train.state import create_train_state
        from mlsp_tpu.utils.config import PointDAConfig
        from mlsp_tpu.utils.torch_export import export_dgcnn

        B, N = self.B, self.N
        # Scan_on_trgt is excluded: a scan-occluded cloud is ~25% exact
        # zeros, which drives some train-mode BN channel variances toward
        # 0 — there f32 summation-order noise (torch vs XLA reduction
        # order) is amplified by 1/sigma into percent-level outputs on
        # BOTH sides, so no implementation could track it. Its loss math
        # is covered by the per-loss differential above.
        # lr=1e-4: Adam's first-step update is +-lr regardless of grad
        # magnitude, so a 1e-7 f32 summation-order difference on a
        # near-zero grad entry (torch vs XLA reduce orders) moves a param
        # by up to 2*lr — an irreducible noise floor for ANY f32
        # implementation pair. Lower lr shrinks that envelope 10x while
        # exercising the identical optimizer/schedule semantics.
        cfg = PointDAConfig(
            batch_size=B, num_points=N, dropout=0.0, epochs=self.EPOCHS,
            lr=1e-5, wd=5e-5, apply_PCM=True, mixup_params=1.0,
            Density_normal_viainput=True, Normal_ondef=True,
            Density_ondef=True, radius=0.3, knn_backend="xla",
            debug_aux=True,  # the torch side must see the BIT-EXACT
            # transform draws the jitted step consumed: an eager replay
            # of the same keys can differ in last-ulp rotations, flipping
            # voxel-boundary region eligibility into a DIFFERENT deformed
            # region entirely
        )
        heads = ("defrec", "normal", "scan", "density")

        # --- identical initial weights ---
        targs = self._torch_args()
        torch.manual_seed(11)
        tmodel = refM.DGCNN(targs).train()
        model = DGCNN(num_classes=10, k=20, dropout=0.0, knn_backend="xla")
        # untrained_heads mirrors the production trainer (config.
        # trained_heads): scan is outside this recipe's loss, so torch's
        # optimizer never touches it (grad None) and ours freezes its
        # decay — asserted byte-identical at the end.
        state = create_train_state(
            model, jax.random.key(0), jnp.zeros((B, N, 3), jnp.float32),
            optimizer="ADAM", lr=cfg.lr, wd=cfg.wd, epochs=self.EPOCHS,
            steps_per_epoch=self.ITERS, heads=heads,
            untrained_heads=("scan",))
        v = import_dgcnn(tmodel.state_dict(), {
            "params": state.params, "batch_stats": state.batch_stats})
        state = state.replace(params=v["params"],
                              batch_stats=v["batch_stats"])

        opt = torch.optim.Adam(tmodel.parameters(), lr=cfg.lr,
                               weight_decay=cfg.wd)
        sched = torch.optim.lr_scheduler.CosineAnnealingLR(
            opt, self.EPOCHS)
        ce = torch.nn.CrossEntropyLoss()
        base_key = jax.random.key(123)

        def cloud():
            # unit-sphere scaled like the data pipeline's
            # scale_to_unit_cube — the deform voxel regions and the
            # radius table assume this scale.
            x = rng.standard_normal((B, N, 3)).astype(np.float32)
            x -= x.mean(1, keepdims=True)
            return x / np.linalg.norm(x, axis=-1).max(-1)[:, None, None]

        for gi in range(self.EPOCHS * self.ITERS):
            src_x = cloud()
            src_y = rng.integers(0, 10, B)
            trgt_x = cloud()
            key_i = jax.random.fold_in(base_key, gi)

            # --- production jax iteration FIRST: its debug_aux output
            # carries the exact transform draws and labels the jitted
            # program consumed, which the torch side replays below ---
            state_prev = state
            state, m = steps.pointda_train_step(
                state, jnp.asarray(src_x), jnp.asarray(src_y),
                jnp.asarray(trgt_x), key_i, cfg)
            src_a = np.asarray(m["aux_src"])
            trgt_a = np.asarray(m["aux_trgt"])
            dx, dmask = np.asarray(m["aux_dx"]), np.asarray(m["aux_dmask"])
            n_gt = np.asarray(m["aux_ngt"])
            dvec, dval = np.asarray(m["aux_dvec"]), np.asarray(m["aux_dval"])
            # a deformed region exists for every cloud (else the
            # REFERENCE's reconstruction_loss is 0/0 and its backward
            # poisons the whole torch trajectory)
            assert dmask.sum(-1).min() >= 40, "fixture too sparse"

            # --- torch reference iteration (PCM mixup branch,
            # trainer.py:394-401; the mixed batch and (ya, yb, lam) are
            # the jitted step's own draws via debug_aux) ---
            opt.zero_grad()
            t_losses = {}
            logits = tmodel(_cf(np.asarray(m["aux_mixed"])),
                            activate_DefRec=False)
            loss_s = PCM.calc_loss(
                targs, logits,
                (_t(np.asarray(m["aux_ya"], np.int64)),
                 _t(np.asarray(m["aux_yb"], np.int64)),
                 float(m["aux_lam"])), ce)
            loss_s.backward()
            t_losses["src_mixup"] = float(loss_s)

            lp = tmodel(_cf(dx), activate_density_normal_ondef=True)
            loss_def = mlsp.calc_loss(targs, lp, _cf(trgt_a), _mask3(dmask))
            t_losses["trgt_DefRec"] = float(loss_def)
            mask_cord = _t(dmask) * 26 + 1  # trainer.py:549-551
            npred = F.normalize(lp["Normal"], p=2, dim=-1)
            ngt = F.normalize(_t(n_gt), p=2, dim=-1)
            norm_loss = targs.normal_pred_weight * (
                -torch.sum(torch.abs(torch.sum(npred * ngt, dim=-1))
                           * mask_cord) / torch.sum(mask_cord))
            t_losses["trgt_def_normal"] = float(norm_loss)
            dcls, dmse = mlsp.densityloss(
                targs, lp, _t(dval.reshape(-1)),
                _t(dvec.reshape(-1, cfg.density_num_class)),
                mask=mask_cord.reshape(-1))
            t_losses["trgt_def_density_cls"] = float(dcls)
            t_losses["trgt_def_density_mse"] = float(dmse)
            (loss_def + norm_loss + dcls + dmse).backward()

            if gi == 0:
                # First-iteration GRADIENT differential, calibrated to
                # the problem's own conditioning. Train-mode forwards of
                # the two stacks diverge at ~1e-4 relative by layer 1
                # (BN batch-statistics see different f32 summation
                # orders), and backprop through 20+ layers with
                # dynamic-kNN/max route flips amplifies that into a
                # 5-40%% per-tensor gradient spread for ANY two f32
                # implementations. Criterion, self-calibrated: agreement
                # with torch must be within 1.5x the gradient's own
                # sensitivity to a 1e-4 input perturbation (the measured
                # cross-implementation noise scale), with a 2%% absolute
                # grace. Torch grads travel through the same state-dict
                # mapping as the weights (purely linear transposes/
                # splits); raw grads exclude weight decay on both sides.
                sd0 = tmodel.state_dict()
                grad_sd = {}
                for name, p in tmodel.named_parameters():
                    grad_sd[name] = (p.grad.detach().clone()
                                     if p.grad is not None else sd0[name])
                for name, t_ in sd0.items():
                    grad_sd.setdefault(name, t_)  # BN stats etc.
                tg = import_dgcnn(grad_sd, {
                    "params": state_prev.params,
                    "batch_stats": state_prev.batch_stats})["params"]
                ours_g = m["aux_grads"]
                # chaos floor from the SAME compiled program on 1e-4
                # perturbed inputs
                _, m_pert = steps.pointda_train_step(
                    state_prev, jnp.asarray(src_x + 1e-4),
                    jnp.asarray(src_y), jnp.asarray(trgt_x + 1e-4),
                    key_i, cfg)
                # the STEP floor: same step, params nudged elementwise
                # by +-lr (rademacher; Adam's exact first-step
                # magnitude) — the unit of divergence one optimizer
                # step can add to a branch loss / a BN stat
                leaves, tdef = jax.tree_util.tree_flatten(
                    state_prev.params)
                ks = jax.random.split(jax.random.key(99), len(leaves))
                state_ppert, m_ppert = steps.pointda_train_step(
                    state_prev.replace(
                        params=jax.tree_util.tree_unflatten(tdef, [
                            l + cfg.lr * jnp.sign(
                                jax.random.normal(k, l.shape))
                            for l, k in zip(leaves, ks)])),
                    jnp.asarray(src_x), jnp.asarray(src_y),
                    jnp.asarray(trgt_x), key_i, cfg)
                # Loss/BN floors use a SMALLER perturbation than the
                # grad floor's 1e-4: the torch side replays the exact
                # transform draws (debug_aux), so a floor contaminated
                # by a discrete voxel-boundary flip (an O(loss) change
                # the real comparison never sees) would be vacuous.
                # Ladder: largest eps whose deform mask is unchanged —
                # big enough to flip the kNN near-ties that ARE the
                # cross-implementation mechanism, small enough to keep
                # the transforms identical.
                m_eps = None
                for eps_probe in (1e-5, 1e-6):
                    st_eps, m_eps = steps.pointda_train_step(
                        state_prev, jnp.asarray(src_x + eps_probe),
                        jnp.asarray(src_y),
                        jnp.asarray(trgt_x + eps_probe), key_i, cfg)
                    if np.array_equal(np.asarray(m_eps["aux_dmask"]),
                                      dmask):
                        break
                in_floor = {b: abs(float(m[b]) - float(m_eps[b]))
                            for b in t_losses}
                step_floor = {b: abs(float(m[b]) - float(m_ppert[b]))
                              for b in t_losses}
                bn_floor = {"mean": 0.0, "var": 0.0}
                for (pa, a), (_, i_), (_, p_) in zip(
                        jax.tree_util.tree_leaves_with_path(
                            state.batch_stats),
                        jax.tree_util.tree_leaves_with_path(
                            st_eps.batch_stats),
                        jax.tree_util.tree_leaves_with_path(
                            state_ppert.batch_stats)):
                    grp = ("var" if "var" in jax.tree_util.keystr(pa)
                           else "mean")
                    a = np.asarray(a, np.float64)
                    sc = max(np.abs(a).max(), 1e-3)
                    d = max(np.abs(a - np.asarray(i_, np.float64)).max(),
                            np.abs(a - np.asarray(p_, np.float64)).max())
                    bn_floor[grp] = max(bn_floor[grp], d / sc)
                pert_g = m_pert["aux_grads"]
                flat_o = dict(jax.tree_util.tree_leaves_with_path(ours_g))
                flat_p = dict(jax.tree_util.tree_leaves_with_path(pert_g))
                checked = 0
                for path, g_t in jax.tree_util.tree_leaves_with_path(tg):
                    name = jax.tree_util.keystr(path)
                    if "RecScan" in name:
                        continue  # head unused in this recipe: torch has
                        # no grads (grad_sd carries weights as filler)
                    if "DenseBN" in name and name.endswith(
                            "['Dense_0']['bias']"):
                        # a Dense bias feeding straight into BatchNorm is
                        # shift-invariant: its true gradient is exactly 0
                        # and both frameworks produce pure rounding noise
                        continue
                    g_o = np.asarray(flat_o[path], np.float64)
                    g_t = np.asarray(g_t, np.float64)
                    nrm = max(np.linalg.norm(g_t), 1e-12)
                    floor = (np.linalg.norm(
                        g_o - np.asarray(flat_p[path], np.float64)) / nrm)
                    rel = np.linalg.norm(g_o - g_t) / nrm
                    assert rel <= max(1.5 * floor, 0.02), (
                        f"grad {name}: rel L2 {rel:.4f} vs perturbation "
                        f"floor {floor:.4f}")
                    checked += 1
                assert checked > 50  # the whole model was compared

            opt.step()
            if (gi + 1) % self.ITERS == 0:
                sched.step()  # per-epoch, trainer.py:574

            # Loss tracking, conditioned on the problem's chaos: the
            # measured grad-direction noise floor between ANY two f32
            # implementations is ~40% (see the gi==0 calibration), so
            # each one-step loss CHANGE carries an O(40%) implementation
            # spread. Criterion: every branch loss stays within
            # [tight f32 tolerance] + [half its own total movement since
            # step 0] of the torch value — step 0 is compared tightly
            # (identical params, pre-update), and a composition bug
            # (doubled weight, wrong schedule/optimizer scale) moves a
            # branch by ~its full movement or more.
            for name, want in t_losses.items():
                # Envelope DERIVED from the in-test floors (measured at
                # gi==0 on this very host, so the suite is portable by
                # construction): the INPUT floor is the branch's loss
                # spread under a 1e-4 input perturbation at identical
                # params — the cross-implementation noise proxy (the
                # deform branches run train-mode forwards on collapsed
                # Gaussian clusters whose kNN graphs are dense with
                # near-ties; torch and XLA pick measurably different
                # graphs from ~1e-7 reduce-order noise). The STEP floor
                # is the spread under a +-lr param nudge — what one
                # optimizer step of divergence can add. Divergence
                # compounds through the deform-branch tie flips, hence
                # the (1+gi) growth on both terms. Composition bugs
                # (doubled weight, wrong schedule/optimizer scale) move
                # a branch by O(loss), so the floor envelope is CAPPED
                # at half the loss — where chaos floors explode (the
                # collapsed-cluster DefRec branch: a +-lr param nudge
                # alone moves it ~8%), the cap keeps the comparison able
                # to catch weight/schedule bugs.
                tol = (min(6.0 * (1 + gi)
                           * (in_floor[name] + step_floor[name]),
                           0.5 * abs(want))
                       + 1e-5 * abs(want) + 1e-6)
                err = abs(float(m[name]) - want)
                assert err <= tol, (
                    f"step {gi}: {name} ours {float(m[name]):.6f} vs "
                    f"torch {want:.6f} (tol {tol:.6f})")

        # --- post-trajectory parameters + BN running stats ---
        sd_ours = export_dgcnn(
            {"params": state.params, "batch_stats": state.batch_stats})
        sd_ref = tmodel.state_dict()
        assert set(sd_ours) == set(sd_ref.keys())
        worst = ("", 0.0)
        for k_, tv in sd_ref.items():
            if k_.endswith("num_batches_tracked"):
                continue
            if k_.startswith("Rec_scan."):
                # Recipe-unused head: torch skips grad-None params; with
                # untrained_heads=("scan",) ours masks the decay too, so
                # the head must stay BYTE-identical on both sides.
                np.testing.assert_array_equal(
                    np.asarray(sd_ours[k_]), tv.numpy(),
                    err_msg=f"frozen head param {k_} moved")
                continue
            a, b = np.asarray(sd_ours[k_], np.float64), tv.numpy().astype(np.float64)
            scale = max(np.abs(b).max(), 1e-3)
            err = float(np.abs(a - b).max())
            if err / scale > worst[1]:
                worst = (k_, err / scale)
            steps_n = self.EPOCHS * self.ITERS
            if "running_" in k_:
                # BN running stats integrate ~3 forwards/step x 6 steps
                # of batch statistics; the envelope is the measured
                # ONE-step drift floor (max of the eps-ladder input and
                # +-lr param responses at gi==0) compounded linearly
                # over the steps — per-step cross-implementation stat
                # noise is the same tie-flip mechanism the floor probes.
                # Measured here: floors ~1.6-2.2% -> lim ~0.3-0.4*scale
                # vs observed drift <= 6.6%.
                grp = "var" if "running_var" in k_ else "mean"
                lim = 3.0 * steps_n * bn_floor[grp] * scale + 1e-3
                assert err <= lim, (
                    f"{k_} running-stat drift {err} (scale {scale})")
                continue
            # Mechanistic Adam envelope: both stacks move an entry by at
            # most ~lr per step, so divergence <= 2*lr*steps even where
            # grad directions fully decorrelate (measured: no key
            # exceeds 2.5*lr*steps; the bulk must track far tighter —
            # 95th percentile).
            assert err <= 3.0 * cfg.lr * steps_n, (
                f"{k_} diverged after {steps_n} steps: max abs {err}")
            q95 = float(np.quantile(np.abs(a - b), 0.95))
            assert q95 <= 2 * cfg.lr * steps_n, (
                f"{k_}: 95th-percentile drift {q95}")

    def test_pointda_scan_trajectory_eval_bn(self, rng):
        """Scan-branch trajectory with EVAL-MODE BN (cfg.debug_bn_eval).

        `Scan_on_trgt` is excluded from the train-mode trajectory above
        for a measured reason: scan-occluded clouds are ~25% exact
        zeros, driving train-mode BN batch variances toward 0 where f32
        reduce-order noise is amplified by 1/sigma on BOTH sides.
        Freezing BN to the (identical, imported) running stats removes
        that mechanism while preserving the rest of the composition —
        scan transform -> scan-head forward -> `mlsp.calc_scan_loss`
        (`trainer.py:492-504`) -> accumulated backward -> Adam/schedule
        threading — so this variant holds the scan branch to the same
        trajectory standard as the other branches. Torch side:
        `model.eval()` (dropout is 0, so eval == frozen BN).

        Tolerances are DERIVED from in-test measured floors, not box
        constants: (a) the INPUT floor — the same compiled step on
        1e-4-perturbed inputs, the cross-implementation noise proxy the
        grad check above already uses; (b) the STEP floor — the same
        step from params perturbed elementwise by +-lr (rademacher;
        Adam's exact first-step magnitude), the unit of divergence one
        optimizer step can add.
        """
        import torch.nn.functional as F  # noqa: F401

        from mlsp_tpu.models import DGCNN
        from mlsp_tpu.train import steps
        from mlsp_tpu.train.state import create_train_state
        from mlsp_tpu.utils.config import PointDAConfig
        from mlsp_tpu.utils.torch_export import export_dgcnn

        B, N = self.B, self.N
        cfg = PointDAConfig(
            batch_size=B, num_points=N, dropout=0.0, epochs=self.EPOCHS,
            lr=1e-5, wd=5e-5, apply_PCM=True, mixup_params=1.0,
            Scan_on_trgt=True, knn_backend="xla",
            debug_aux=True, debug_bn_eval=True)
        heads = ("defrec", "normal", "scan", "density")
        branches = ("src_mixup", "trgt_Rec_scan")

        targs = self._torch_args()
        torch.manual_seed(17)
        tmodel = refM.DGCNN(targs)
        tmodel.eval()  # frozen BN on the torch side too
        model = DGCNN(num_classes=10, k=20, dropout=0.0, knn_backend="xla")
        state = create_train_state(
            model, jax.random.key(0), jnp.zeros((B, N, 3), jnp.float32),
            optimizer="ADAM", lr=cfg.lr, wd=cfg.wd, epochs=self.EPOCHS,
            steps_per_epoch=self.ITERS, heads=heads,
            untrained_heads=("defrec", "normal", "density"))
        v = import_dgcnn(tmodel.state_dict(), {
            "params": state.params, "batch_stats": state.batch_stats})
        state = state.replace(params=v["params"],
                              batch_stats=v["batch_stats"])
        bn_init = jax.tree_util.tree_map(np.asarray, state.batch_stats)

        opt = torch.optim.Adam(tmodel.parameters(), lr=cfg.lr,
                               weight_decay=cfg.wd)
        sched = torch.optim.lr_scheduler.CosineAnnealingLR(opt, self.EPOCHS)
        ce = torch.nn.CrossEntropyLoss()
        base_key = jax.random.key(321)

        def cloud():
            x = rng.standard_normal((B, N, 3)).astype(np.float32)
            x -= x.mean(1, keepdims=True)
            return x / np.linalg.norm(x, axis=-1).max(-1)[:, None, None]

        in_floor = step_floor = None
        for gi in range(self.EPOCHS * self.ITERS):
            src_x, src_y, trgt_x = cloud(), rng.integers(0, 10, B), cloud()
            key_i = jax.random.fold_in(base_key, gi)
            state_prev = state
            state, m = steps.pointda_train_step(
                state, jnp.asarray(src_x), jnp.asarray(src_y),
                jnp.asarray(trgt_x), key_i, cfg)

            if gi == 0:
                # (a) input floor: same step, 1e-4-perturbed inputs
                _, m_in = steps.pointda_train_step(
                    state_prev, jnp.asarray(src_x + 1e-4),
                    jnp.asarray(src_y), jnp.asarray(trgt_x + 1e-4),
                    key_i, cfg)
                # (b) step floor: same step, params nudged +-lr
                leaves, tdef = jax.tree_util.tree_flatten(state_prev.params)
                ks = jax.random.split(jax.random.key(99), len(leaves))
                pleaves = [
                    l + cfg.lr * jnp.sign(jax.random.normal(k, l.shape))
                    for l, k in zip(leaves, ks)]
                _, m_par = steps.pointda_train_step(
                    state_prev.replace(
                        params=jax.tree_util.tree_unflatten(tdef, pleaves)),
                    jnp.asarray(src_x), jnp.asarray(src_y),
                    jnp.asarray(trgt_x), key_i, cfg)
                in_floor = {b: abs(float(m[b]) - float(m_in[b]))
                            for b in branches}
                step_floor = {b: abs(float(m[b]) - float(m_par[b]))
                              for b in branches}

            # torch replication: PCM mixup + scan, the jitted step's own
            # draws via debug_aux (trainer.py:396-401, 492-504)
            opt.zero_grad()
            logits = tmodel(_cf(np.asarray(m["aux_mixed"])),
                            activate_DefRec=False)
            loss_s = PCM.calc_loss(
                targs, logits,
                (_t(np.asarray(m["aux_ya"], np.int64)),
                 _t(np.asarray(m["aux_yb"], np.int64)),
                 float(m["aux_lam"])), ce)
            loss_s.backward()
            sl = tmodel(_cf(np.asarray(m["aux_sx"])), activate_scan=True)
            loss_sc = mlsp.calc_scan_loss(
                targs, sl, _cf(np.asarray(m["aux_trgt"])),
                _mask3(np.asarray(m["aux_smask"])))
            loss_sc.backward()
            opt.step()
            if (gi + 1) % self.ITERS == 0:
                sched.step()

            for name, want in (("src_mixup", float(loss_s)),
                               ("trgt_Rec_scan", float(loss_sc))):
                tol = (4.0 * (in_floor[name] * (1 + gi)
                              + gi * step_floor[name])
                       + 1e-5 * abs(want) + 1e-6)
                err = abs(float(m[name]) - want)
                # measured on this box: src_mixup errs ~2e-6 (100x
                # margin), scan errs grow 1e-7 -> 2e-5 by step 5 (the
                # scan in_floor is dominated by the transform's discrete
                # input sensitivity, ~1.5% of the loss — a composition
                # bug like a doubled Scan_Rec_weight moves 100%)
                assert err <= tol, (
                    f"step {gi}: {name} ours {float(m[name]):.6f} vs "
                    f"torch {want:.6f} (tol {tol:.6f})")

        # BN never updated: running stats byte-identical to init
        for (pa, a), (_, b) in zip(
                jax.tree_util.tree_leaves_with_path(state.batch_stats),
                jax.tree_util.tree_leaves_with_path(bn_init)):
            np.testing.assert_array_equal(
                np.asarray(a), b,
                err_msg=f"frozen BN stat moved: {jax.tree_util.keystr(pa)}")

        sd_ours = export_dgcnn(
            {"params": state.params, "batch_stats": state.batch_stats})
        sd_ref = tmodel.state_dict()
        steps_n = self.EPOCHS * self.ITERS
        worst = ("", 0.0)
        for k_, tv in sd_ref.items():
            if k_.endswith("num_batches_tracked") or "running_" in k_:
                continue
            if k_.startswith(("DefRec.", "Norm_pred.", "Density_cls.")):
                np.testing.assert_array_equal(
                    np.asarray(sd_ours[k_]), tv.numpy(),
                    err_msg=f"frozen head param {k_} moved")
                continue
            a = np.asarray(sd_ours[k_], np.float64)
            b = tv.numpy().astype(np.float64)
            err = float(np.abs(a - b).max())
            if err > worst[1]:
                worst = (k_, err)
            # mechanistic Adam envelope: both stacks move an entry by at
            # most ~lr per step, so divergence <= 2*lr*steps (+margin for
            # Adam's transient >1 moment ratio); frozen BN removes every
            # scale-proportional mechanism. Measured worst: 7.5e-5.
            assert err <= 3.0 * cfg.lr * steps_n, (
                f"{k_} diverged after {steps_n} steps: max abs {err}")

    def test_pointsegda_train_trajectory(self, rng):
        """Seg-config trajectory (`PointSegDA/trainer.py:282-439`):
        source seg CE + target DefRec through the production seg step vs
        a faithful torch replication with the reference's own
        `DGCNN_DefRec` — same calibration approach as the PointDA test.
        """
        from mlsp_tpu.models import DGCNNSeg
        from mlsp_tpu.train import seg_steps
        from mlsp_tpu.train.state import create_train_state
        from mlsp_tpu.utils.config import PointSegDAConfig
        from mlsp_tpu.utils.torch_export import export_dgcnn_seg

        B, N, EPOCHS, ITERS = 4, 256, 2, 2
        cfg = PointSegDAConfig(
            batch_size=B, num_points=N, dropout=0.0, epochs=EPOCHS,
            lr=1e-5, wd=5e-5, apply_PCM=False, DefRec_on_trgt=True,
            DefRec_weight=0.02, knn_backend="xla", debug_aux=True)
        targs = SimpleNamespace(
            num_class=8, dropout=0.0, model="dgcnn", encoder_type="",
            cuda=False, gpus=[-1], density_num_class=16, pergroup=5.0,
            DefRec_weight=0.02)
        torch.manual_seed(13)
        tmodel = refSegM.DGCNN_DefRec(targs, in_size=3, num_classes=8).train()
        heads = ("seg", "defrec", "normal", "density")
        model = DGCNNSeg(num_classes=8, k=20, dropout=0.0, pergroup=5.0,
                         knn_backend="xla")
        # normal/density are outside this recipe's loss — frozen, like
        # the production seg trainer (config.trained_seg_heads).
        state = create_train_state(
            model, jax.random.key(0), jnp.zeros((B, N, 3), jnp.float32),
            optimizer="ADAM", lr=cfg.lr, wd=cfg.wd, epochs=EPOCHS,
            steps_per_epoch=ITERS, heads=heads,
            untrained_heads=("normal", "density"))
        v = import_dgcnn_seg(tmodel.state_dict(), {
            "params": state.params, "batch_stats": state.batch_stats},
            pergroup=5.0)
        state = state.replace(params=v["params"],
                              batch_stats=v["batch_stats"])
        opt = torch.optim.Adam(tmodel.parameters(), lr=cfg.lr,
                               weight_decay=cfg.wd)
        sched = torch.optim.lr_scheduler.CosineAnnealingLR(
            opt, EPOCHS, eta_min=0.0)  # trainer.py:216
        ce = torch.nn.CrossEntropyLoss()
        base_key = jax.random.key(7)

        def cloud():
            x = rng.standard_normal((B, N, 3)).astype(np.float32)
            x -= x.mean(1, keepdims=True)
            return x / np.linalg.norm(x, axis=-1).max(-1)[:, None, None]

        in_floor = step_floor = bn_floor = None
        for gi in range(EPOCHS * ITERS):
            src_x = cloud()
            src_y = rng.integers(0, 8, (B, N))
            trgt_x = cloud()
            key_i = jax.random.fold_in(base_key, gi)
            state_prev = state
            state, m, _preds = seg_steps.pointsegda_train_step(
                state, jnp.asarray(src_x), jnp.asarray(src_y),
                jnp.asarray(trgt_x), key_i, cfg)
            src_a = np.asarray(m["aux_src"])
            sy = np.asarray(m["aux_sy"], np.int64)
            trgt_a = np.asarray(m["aux_trgt"])
            dx, dmask = np.asarray(m["aux_dx"]), np.asarray(m["aux_dmask"])
            assert dmask.sum(-1).min() >= 40, "fixture too sparse"

            if gi == 0:
                # In-test chaos floors (cf. the PointDA trajectory): the
                # eps-ladder INPUT floor (largest eps keeping the deform
                # mask unchanged — pure forward/tie-flip noise) and the
                # +-lr rademacher param STEP floor.
                for eps_probe in (1e-5, 1e-6):
                    st_eps, m_eps, _ = seg_steps.pointsegda_train_step(
                        state_prev, jnp.asarray(src_x + eps_probe),
                        jnp.asarray(src_y),
                        jnp.asarray(trgt_x + eps_probe), key_i, cfg)
                    if np.array_equal(np.asarray(m_eps["aux_dmask"]),
                                      dmask):
                        break
                leaves, tdef = jax.tree_util.tree_flatten(
                    state_prev.params)
                ks = jax.random.split(jax.random.key(99), len(leaves))
                st_pp, m_pp, _ = seg_steps.pointsegda_train_step(
                    state_prev.replace(
                        params=jax.tree_util.tree_unflatten(tdef, [
                            l + cfg.lr * jnp.sign(
                                jax.random.normal(k, l.shape))
                            for l, k in zip(leaves, ks)])),
                    jnp.asarray(src_x), jnp.asarray(src_y),
                    jnp.asarray(trgt_x), key_i, cfg)
                branches = ("src_seg", "trgt_DefRec")
                in_floor = {b: abs(float(m[b]) - float(m_eps[b]))
                            for b in branches}
                step_floor = {b: abs(float(m[b]) - float(m_pp[b]))
                              for b in branches}
                bn_floor = {"mean": 0.0, "var": 0.0}
                for (pa, a), (_, i_), (_, p_) in zip(
                        jax.tree_util.tree_leaves_with_path(
                            state.batch_stats),
                        jax.tree_util.tree_leaves_with_path(
                            st_eps.batch_stats),
                        jax.tree_util.tree_leaves_with_path(
                            st_pp.batch_stats)):
                    grp = ("var" if "var" in jax.tree_util.keystr(pa)
                           else "mean")
                    a = np.asarray(a, np.float64)
                    sc = max(np.abs(a).max(), 1e-3)
                    d = max(np.abs(a - np.asarray(i_, np.float64)).max(),
                            np.abs(a - np.asarray(p_, np.float64)).max())
                    bn_floor[grp] = max(bn_floor[grp], d / sc)

            opt.zero_grad()
            logits = tmodel(_cf(src_a), make_seg=True, activate_DefRec=False)
            loss_s = (1 - targs.DefRec_weight) * ce(
                logits["seg"].permute(0, 2, 1), _t(sy))  # trainer.py:309
            loss_s.backward()
            lp = tmodel(_cf(dx), make_seg=False, activate_DefRec=True)
            loss_d = mlsp.calc_loss(targs, lp, _cf(trgt_a), _mask3(dmask))
            loss_d.backward()  # trainer.py:332-339
            opt.step()
            if (gi + 1) % ITERS == 0:
                sched.step()  # per-epoch, trainer.py:439

            for name, want in (("src_seg", float(loss_s)),
                               ("trgt_DefRec", float(loss_d))):
                # floor-derived envelope, capped at half the loss so
                # composition bugs (O(loss) shifts) stay catchable even
                # where the chaos floors are large (cf. the PointDA
                # trajectory's derivation)
                tol = (min(6.0 * (1 + gi)
                           * (in_floor[name] + step_floor[name]),
                           0.5 * abs(want))
                       + 1e-5 * abs(want) + 1e-6)
                assert abs(float(m[name]) - want) <= tol, (
                    f"seg step {gi}: {name} ours {float(m[name]):.6f} vs "
                    f"torch {want:.6f} (tol {tol:.6f})")

        sd_ours = export_dgcnn_seg(
            {"params": state.params, "batch_stats": state.batch_stats},
            pergroup=5.0)
        sd_ref = tmodel.state_dict()
        steps_n = EPOCHS * ITERS
        for k_, tv in sd_ref.items():
            if k_.endswith("num_batches_tracked"):
                continue
            if k_.startswith(("Norm_pred.", "Density_cls.")):
                # Recipe-unused heads: frozen on both sides (torch
                # grad-None skip / our untrained_heads decay mask) —
                # must stay byte-identical.
                np.testing.assert_array_equal(
                    np.asarray(sd_ours[k_]), tv.numpy(),
                    err_msg=f"frozen head param {k_} moved")
                continue
            if k_.startswith("shared_layers.conv") and not k_.startswith(
                    "shared_layers.conv6"):
                # LinearEdgeBlock double-convs export through a pinv
                # RE-PARAMETERISATION: ours trains untied (d0,d1,c0,c1)
                # coordinates, torch trains (conv_a, conv_b) — gradient
                # descent moves the two coordinate systems differently
                # even when the FUNCTIONS track, so elementwise weight
                # comparison is meaningless here. Function-level tracking
                # is asserted by the eval-forward check below.
                continue
            a = np.asarray(sd_ours[k_], np.float64)
            b = tv.numpy().astype(np.float64)
            scale = max(np.abs(b).max(), 1e-3)
            err = float(np.abs(a - b).max())
            if "running_" in k_:
                # one-step measured floor compounded over the steps
                # (cf. the PointDA trajectory's derivation)
                grp = "var" if "running_var" in k_ else "mean"
                lim = 3.0 * steps_n * bn_floor[grp] * scale + 1e-3
                assert err <= lim, f"{k_} running-stat drift {err}"
                continue
            # mechanistic Adam envelope (divergence <= ~2*lr per step)
            assert err <= 3.0 * cfg.lr * steps_n, (
                f"{k_} diverged after {steps_n} steps: max abs {err}")

        # function-level tracking for the re-parameterised blocks: both
        # final models must agree on a fresh eval forward
        x = cloud()
        tmodel.eval()
        with torch.no_grad():
            want = tmodel(_cf(x), make_seg=True,
                          activate_DefRec=False)["seg"].numpy()
        got = np.asarray(model.apply(
            {"params": state.params, "batch_stats": state.batch_stats},
            jnp.asarray(x), train=False, heads=("seg",))["seg"])
        rel = (np.linalg.norm(got - want)
               / max(np.linalg.norm(want), 1e-9))
        assert rel < 0.05, f"final seg forwards diverged: rel L2 {rel:.4f}"


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
