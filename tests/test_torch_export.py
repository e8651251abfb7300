"""Torch checkpoint EXPORT: train here, deploy in the reference.

Differential tests of `utils/torch_export` against the reference's own
torch modules: an exported state_dict must strict-`load_state_dict` into
the reference model (every key, every shape) and reproduce the flax
forward exactly. Variables are randomly perturbed first (params AND
batch-norm running stats) so an identity-mapped BN cannot mask a wrong
mapping.

The seg model additionally exercises the pinv re-parameterisation of
`LinearEdgeBlock` (flax trains untied second-stage maps; the torch
`shared_layers` double conv has one — see torch_export module doc).
"""

from __future__ import annotations

import sys
import types
from types import SimpleNamespace

import numpy as np
import pytest

torch = pytest.importorskip("torch")

sys.modules.setdefault("pcl", types.ModuleType("pcl"))
if "/root/reference" not in sys.path:
    sys.path.insert(0, "/root/reference")


def _stub_reference_model_deps():
    """PointDA/Models.py imports CUDA-only deps at module scope; stub them
    (forward paths under test never touch them on CPU)."""
    knn_cuda = types.ModuleType("knn_cuda")

    class _FakeKNN:  # instantiable (PointTransformer builds KNN objects)
        def __init__(self, *a, **k):
            pass

        def __call__(self, *a, **k):
            raise RuntimeError("KNN_CUDA stub: CPU tests must bypass it")

    knn_cuda.KNN = _FakeKNN
    sys.modules.setdefault("knn_cuda", knn_cuda)
    if sys.modules["knn_cuda"].KNN is object:  # older stub from another file
        sys.modules["knn_cuda"].KNN = _FakeKNN
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

import jax
import jax.numpy as jnp

from mlsp_tpu.models import DGCNN, DGCNNSeg, PointNet
from mlsp_tpu.utils.torch_export import (
    export_dgcnn,
    export_dgcnn_seg,
    export_pointnet,
    save_torch_checkpoint,
)
from mlsp_tpu.utils.torch_import import (
    CheckpointMismatchError,
    import_dgcnn,
    load_torch_state_dict,
)

B, N = 3, 64


def _ref_args(model="dgcnn", pergroup=2.0):
    return SimpleNamespace(
        num_class=10, dropout=0.5, model=model, encoder_type="", cuda=False,
        density_num_class=16, pergroup=pergroup, gpus=[-1],
    )


def _init_flax(model, heads):
    return jax.jit(
        lambda r, x: model.init({"params": r}, x, train=False, heads=heads)
    )(jax.random.key(0), jnp.zeros((1, N, 3), jnp.float32))


def _perturb(variables, seed):
    """Random params + non-trivial BN running stats: at init BN is an
    (almost) identity, which would hide running_mean/var mapping bugs.

    Scales are deliberately moderate: the export mapping is f64-exact
    (verified by recomputing both parameterisations in numpy f64 —
    0.0 difference at every stage), but flax-f32 vs torch-f32 forwards
    accumulate independent rounding that ReLU zero-crossings and
    max-pool argmax swaps amplify; large perturbations push that noise
    to ~1% and drown the signal. At these scales the noise floor is
    ~1e-5 while any mapping bug (swapped stats, misrouted BN, lost
    bias) shows at the perturbation scale, well above the 1e-3 gate."""
    rng = np.random.default_rng(seed)

    def p_leaf(a):
        a = np.asarray(a, np.float32)
        return a + 0.02 * rng.standard_normal(a.shape).astype(np.float32)

    def s_leaf(path, a):
        a = np.asarray(a, np.float32)
        if path[-1].key == "var":
            return rng.uniform(0.9, 1.1, a.shape).astype(np.float32)
        return 0.05 * rng.standard_normal(a.shape).astype(np.float32)

    return {
        "params": jax.tree_util.tree_map(p_leaf, variables["params"]),
        "batch_stats": jax.tree_util.tree_map_with_path(
            s_leaf, variables["batch_stats"]),
    }


def _cloud(rng):
    return rng.standard_normal((B, N, 3)).astype(np.float32)


def _cf(x):
    return torch.from_numpy(np.asarray(x)).permute(0, 2, 1).contiguous()


def _load_strict(ref, sd_np):
    """strict load_state_dict of a numpy export — asserts the exported
    key/shape inventory matches the reference model exactly."""
    ref.load_state_dict({k: torch.from_numpy(np.ascontiguousarray(v))
                         for k, v in sd_np.items()})
    return ref.eval()


class TestExportDGCNN:
    heads = ("defrec", "normal", "scan", "density")

    def _variables(self):
        return _perturb(_init_flax(DGCNN(num_classes=10, k=20), self.heads), 1)

    def test_strict_load_and_forward(self, rng):
        model = DGCNN(num_classes=10, k=20)
        v = self._variables()
        ref = _load_strict(refM.DGCNN(_ref_args("dgcnn")), export_dgcnn(v))

        x = _cloud(rng)
        got = model.apply(v, jnp.asarray(x), train=False, heads=self.heads)
        with torch.no_grad():
            want = ref(_cf(x), activate_DefRec=True, activate_normal=True,
                       activate_scan=True, activate_density=True)
        for ours, theirs in (("cls", "cls"), ("defrec", "DefRec"),
                             ("normal", "Normal"), ("scan", "Rec_scan")):
            np.testing.assert_allclose(
                np.asarray(got[ours]), want[theirs].numpy(),
                rtol=1e-3, atol=1e-3, err_msg=ours)
        np.testing.assert_allclose(
            np.asarray(got["density"]).reshape(B * N, -1),
            want["density"].numpy(), rtol=1e-3, atol=1e-3)
        np.testing.assert_allclose(
            np.asarray(got["density_mse"]).reshape(-1),
            want["density_mse"].numpy(), rtol=1e-3, atol=1e-3)

    def test_import_export_roundtrip_exact(self):
        """import(export(v)) reproduces every flax leaf bit-exactly (the
        DGCNN decompositions are lossless in both directions)."""
        v = self._variables()
        v2 = import_dgcnn(
            {k: torch.from_numpy(np.ascontiguousarray(a))
             for k, a in export_dgcnn(v).items()},
            _init_flax(DGCNN(num_classes=10, k=20), self.heads))
        for (pa, a), (pb, b) in zip(
            jax.tree_util.tree_leaves_with_path(v),
            jax.tree_util.tree_leaves_with_path(v2),
        ):
            assert pa == pb
            np.testing.assert_array_equal(
                np.asarray(a), np.asarray(b), err_msg=str(pa))

    def test_missing_head_strict_raises(self):
        v = _init_flax(DGCNN(num_classes=10, k=20), ("defrec",))
        with pytest.raises(CheckpointMismatchError, match="NormPred"):
            export_dgcnn(v)
        sd = export_dgcnn(v, strict=False)  # partial export still works
        assert "DefRec.conv1.weight" in sd
        assert not any(k.startswith("Norm_pred") for k in sd)

    def test_save_torch_checkpoint_roundtrip(self, tmp_path, rng):
        v = self._variables()
        path = str(tmp_path / "model.pt")
        save_torch_checkpoint(export_dgcnn(v), path)
        sd = load_torch_state_dict(path)
        ref = _load_strict(refM.DGCNN(_ref_args("dgcnn")), {
            k: t.numpy() for k, t in sd.items()})
        x = _cloud(rng)
        with torch.no_grad():
            want = ref(_cf(x))
        got = DGCNN(num_classes=10, k=20).apply(
            v, jnp.asarray(x), train=False)
        np.testing.assert_allclose(
            np.asarray(got["cls"]), want["cls"].numpy(), rtol=1e-3, atol=1e-3)


class TestExportPointNet:
    def test_strict_load_and_forward(self, rng):
        model = PointNet(num_classes=10)
        v = _perturb(_init_flax(model, ("defrec",)), 2)
        ref = _load_strict(refM.PointNet(_ref_args("pointnet")),
                           export_pointnet(v))

        x = _cloud(rng)
        got = model.apply(v, jnp.asarray(x), train=False, heads=("defrec",))
        with torch.no_grad():
            want = ref(_cf(x), activate_DefRec=True)
        np.testing.assert_allclose(
            np.asarray(got["cls"]), want["cls"].numpy(), rtol=1e-3, atol=1e-3)
        np.testing.assert_allclose(
            np.asarray(got["defrec"]), want["DefRec"].numpy(),
            rtol=1e-3, atol=1e-3)


class TestExportDGCNNSeg:
    heads = ("seg", "defrec", "normal", "density")

    def test_strict_load_and_forward(self, rng):
        model = DGCNNSeg(num_classes=8, k=20, pergroup=5.0)
        v = _perturb(_init_flax(model, self.heads), 3)
        args = _ref_args("dgcnn", pergroup=5.0)
        ref = _load_strict(
            refSegM.DGCNN_DefRec(args, in_size=3, num_classes=8),
            export_dgcnn_seg(v, pergroup=5.0))

        x = _cloud(rng)
        got = model.apply(v, jnp.asarray(x), train=False, heads=self.heads)
        with torch.no_grad():
            want = ref(_cf(x), make_seg=True, activate_DefRec=True,
                       activate_normal=True, activate_density=True)
        for ours, theirs in (("seg", "seg"), ("defrec", "DefRec"),
                             ("normal", "Normal")):
            np.testing.assert_allclose(
                np.asarray(got[ours]), want[theirs].numpy(),
                rtol=1e-3, atol=1e-3, err_msg=ours)
        np.testing.assert_allclose(
            np.asarray(got["density"]).reshape(B * N, -1),
            want["density"].numpy(), rtol=1e-3, atol=1e-3)
        np.testing.assert_allclose(
            np.asarray(got["density_mse"]).reshape(-1),
            want["density_mse"].numpy(), rtol=1e-3, atol=1e-3)


class TestExportHengshuang:
    """HengshuangTransformer/-Seg -> the reference hengshuang models,
    FULLY strict-loadable, forward-equivalent (reference FPS pinned to
    the same start-0 convention; cf. TestHengshuangImport)."""

    NB, K, DM, NPT = 4, 8, 64, 256

    def _cfg(self):
        cfg = SimpleNamespace(
            num_point=self.NPT, nblocks=self.NB, nneighbor=self.K,
            num_class=10, input_dim=3, transformer_dim=self.DM, dropout=0.5)
        cfg.model = cfg
        return cfg

    @staticmethod
    def _pin_fps(monkeypatch):
        from torch_fixtures import pin_reference_fps

        pin_reference_fps(monkeypatch)

    def _cloud(self, rng):
        return rng.standard_normal((2, self.NPT, 3)).astype(np.float32)

    def test_def_strict_load_and_forward(self, rng, monkeypatch):
        ref_hm = pytest.importorskip(
            "PointDA.hengshuang_transformer.hengshuang_model")
        from mlsp_tpu.models.hengshuang import HengshuangTransformer
        from mlsp_tpu.utils.torch_export import export_hengshuang

        self._pin_fps(monkeypatch)
        model = HengshuangTransformer(
            num_classes=10, nblocks=self.NB, nneighbor=self.K,
            d_model=self.DM)
        v = jax.jit(lambda r, x: model.init(
            {"params": r}, x, train=False, heads=("defrec",)))(
            jax.random.key(0), jnp.zeros((1, self.NPT, 3), jnp.float32))
        v = _perturb(v, 41)
        sd = export_hengshuang(v, nblocks=self.NB)

        torch.manual_seed(41)
        ref = _load_strict(ref_hm.PointTransformerDef(self._cfg()), sd)
        x = self._cloud(rng)
        with torch.no_grad():
            want_cls = ref(torch.from_numpy(x), activate_DefRec=False)
            want_def = ref(torch.from_numpy(x), activate_DefRec=True)
        got = model.apply(v, jnp.asarray(x), train=False, heads=("defrec",))
        np.testing.assert_allclose(np.asarray(got["cls"]),
                                   want_cls.numpy(), rtol=1e-3, atol=1e-3)
        np.testing.assert_allclose(np.asarray(got["defrec"]),
                                   want_def.numpy(), rtol=1e-3, atol=1e-3)

    def test_seg_strict_load_and_forward(self, rng, monkeypatch):
        ref_hm = pytest.importorskip(
            "PointDA.hengshuang_transformer.hengshuang_model")
        from mlsp_tpu.models.hengshuang import HengshuangSeg
        from mlsp_tpu.utils.torch_export import export_hengshuang

        self._pin_fps(monkeypatch)
        model = HengshuangSeg(num_classes=10, nblocks=self.NB,
                              nneighbor=self.K, d_model=self.DM)
        v = jax.jit(lambda r, x: model.init(
            {"params": r}, x, train=False, heads=("seg",)))(
            jax.random.key(0), jnp.zeros((1, self.NPT, 3), jnp.float32))
        v = _perturb(v, 42)
        sd = export_hengshuang(v, nblocks=self.NB)
        ref = _load_strict(ref_hm.PointTransformerSeg(self._cfg()), sd)
        x = self._cloud(rng)
        with torch.no_grad():
            want = ref(torch.from_numpy(x))
        got = model.apply(v, jnp.asarray(x), train=False, heads=("seg",))
        np.testing.assert_allclose(np.asarray(got["seg"]), want.numpy(),
                                   rtol=1e-3, atol=1e-3)

    def test_import_export_roundtrip_exact(self):
        """export -> import is the identity on every leaf."""
        from mlsp_tpu.models.hengshuang import HengshuangTransformer
        from mlsp_tpu.utils.torch_export import export_hengshuang
        from mlsp_tpu.utils.torch_import import import_hengshuang

        model = HengshuangTransformer(
            num_classes=10, nblocks=self.NB, nneighbor=self.K,
            d_model=self.DM)
        v = jax.jit(lambda r, x: model.init(
            {"params": r}, x, train=False, heads=("defrec",)))(
            jax.random.key(2), jnp.zeros((1, self.NPT, 3), jnp.float32))
        v = _perturb(v, 43)
        sd = {k: torch.from_numpy(np.ascontiguousarray(a))
              for k, a in export_hengshuang(v, nblocks=self.NB).items()}
        back = import_hengshuang(sd, v, nblocks=self.NB)
        jax.tree_util.tree_map(
            lambda a, b: np.testing.assert_array_equal(
                np.asarray(a), np.asarray(b)),
            {"params": v["params"], "batch_stats": v["batch_stats"]},
            {"params": back["params"], "batch_stats": back["batch_stats"]})


class TestExportPointTransformer:
    """Backbone + cls head export (the reference's CUDA DefRec pyramid is
    not representable): torch loads strict=False — exactly how the
    reference loads pretrained transformers — and the cls forward must
    match; missing keys must be ONLY the pyramid/DefRec modules."""

    G, M, D, E, HEADS, DEPTH, NPT = 16, 8, 96, 64, 4, 4, 128

    def test_nonstrict_load_and_cls_forward(self, rng):
        from mlsp_tpu.models.transformer import (
            PointTransformer, group_points_knn,
        )
        from mlsp_tpu.utils.torch_export import export_point_transformer

        model = PointTransformer(
            num_classes=10, trans_dim=self.D, depth=self.DEPTH,
            heads=self.HEADS, num_group=self.G, group_size=self.M,
            encoder_dims=self.E)
        v = jax.jit(lambda r, x: model.init(
            {"params": r}, x, train=False))(
            jax.random.key(0), jnp.zeros((1, self.NPT, 3), jnp.float32))
        v = _perturb(v, 44)
        # the reference qkv is bias-free; exporting drops nonzero flax
        # qkv biases with a warning — zero them so both sides agree
        for blk, sub in v["params"].items():
            if blk.startswith("block"):
                mha = sub["MultiHeadDotProductAttention_0"]
                for nm in ("query", "key", "value"):
                    mha[nm]["bias"] = np.zeros_like(
                        np.asarray(mha[nm]["bias"]))
        sd = export_point_transformer(v)

        cfg = SimpleNamespace(
            trans_dim=self.D, depth=self.DEPTH, drop_path_rate=0.0,
            cls_dim=10, num_heads=self.HEADS, group_size=self.M,
            num_group=self.G, encoder_dims=self.E, encoder_type="Encoder",
            dropout=0.5, model="transformer")
        torch.manual_seed(44)
        ref = refM.PointTransformer(cfg)
        inc = ref.load_state_dict(
            {k: torch.from_numpy(np.ascontiguousarray(a))
             for k, a in sd.items()}, strict=False)
        assert not inc.unexpected_keys, inc.unexpected_keys
        allowed = ("propagation_", "dgcnn_pro_", "DefRec.")
        bad = [k for k in inc.missing_keys if not k.startswith(allowed)]
        assert not bad, f"unexpectedly missing: {bad}"
        ref.eval()

        x = rng.standard_normal((2, self.NPT, 3)).astype(np.float32)
        neigh, centers = group_points_knn(
            jnp.asarray(x), self.G, self.M, jnp.zeros((2,), jnp.int32))

        class _FixedGroup(torch.nn.Module):
            def forward(self, pts):
                return (torch.from_numpy(np.asarray(neigh)),
                        torch.from_numpy(np.asarray(centers)))

        ref.group_divider = _FixedGroup()
        with torch.no_grad():
            want = ref(torch.from_numpy(x), activate_DefRec=False)
        got = model.apply(v, jnp.asarray(x), train=False)
        # perturbed BN stats + 4 softmax-attention blocks amplify f32
        # rounding multiplicatively (~3e-3 on O(1) logits); a mapping bug
        # (e.g. a transposed qkv slice) diverges at O(1)
        np.testing.assert_allclose(np.asarray(got["cls"]), want.numpy(),
                                   rtol=1e-2, atol=5e-3)


@pytest.mark.slow
class TestExportedModelTrains:
    """'Train here, deploy there' must include further TRAINING there:
    an exported checkpoint dropped into the reference stack has to be
    optimizable (finite grads through every mapped parameter, loss
    decreasing), not just forward-equivalent."""

    def test_torch_finetune_step_on_export(self, rng):
        from mlsp_tpu.models import DGCNN
        from mlsp_tpu.utils.torch_export import export_dgcnn

        model = DGCNN(num_classes=10, k=20)
        v = _perturb(_init_flax(
            model, ("defrec", "normal", "scan", "density")), 13)
        ref = _load_strict(refM.DGCNN(_ref_args("dgcnn")), export_dgcnn(v))
        ref.train()

        x = torch.from_numpy(
            rng.standard_normal((B, N, 3)).astype(np.float32))
        y = torch.from_numpy(rng.integers(0, 10, B).astype(np.int64))
        opt = torch.optim.SGD(ref.parameters(), lr=1e-2)
        crit = torch.nn.CrossEntropyLoss()
        losses = []
        for _ in range(8):
            opt.zero_grad()
            logits = ref(x.permute(0, 2, 1), activate_DefRec=False)
            loss = crit(logits["cls"], y)
            loss.backward()
            for p in ref.parameters():
                if p.grad is not None:
                    assert torch.isfinite(p.grad).all()
            opt.step()
            losses.append(float(loss))
        assert all(np.isfinite(losses))
        assert losses[-1] < losses[0], losses


@pytest.mark.slow
class TestSPSTFinetuneTrajectory:
    """The SPST fine-tune loop vs a faithful torch replication of
    `train_spst.py:472-501`: CE on pseudo-labeled target (spl_weight) +
    CE on source (cls_weight), gradients accumulated across both
    backwards into ONE optimizer step, weights decaying 5e-3 per epoch
    and torch's cyclic CosineAnnealingLR(T_max=epochs) stepping across
    rounds. PCM off and dropout 0 make the iteration deterministic
    (augmentation is patched to identity on our side; the reference's
    DataLoad z-rotation is likewise bypassed). The per-epoch LR is
    asserted EXACTLY equal to torch's real scheduler through round 2;
    losses track within measured-noise gates until maxpool route-flip
    chaos takes over; final params stay in the lr/momentum envelope."""

    B_, N_, ROUNDS, EPOCHS, ITERS = 4, 64, 2, 2, 2

    def test_losses_and_params_track(self, rng, monkeypatch):
        import mlsp_tpu.train.spst as spst_mod
        from mlsp_tpu.models import make_model
        from mlsp_tpu.train.state import (
            create_train_state, set_learning_rate, torch_cosine_lr,
        )
        from mlsp_tpu.utils.config import SPSTConfig
        from mlsp_tpu.utils.torch_export import export_pointnet
        from mlsp_tpu.utils.torch_import import import_pointnet

        monkeypatch.setattr(spst_mod, "random_rotate_one_axis",
                            lambda k, x, ax: x)
        monkeypatch.setattr(spst_mod, "augment_batch", lambda k, x: x)

        model = make_model("pointnet", 10, dropout=0.0)
        v = _perturb(jax.jit(
            lambda r, x: model.init({"params": r}, x, train=False,
                                    heads=("defrec",)))(
            jax.random.key(3), jnp.zeros((1, self.N_, 3), jnp.float32)), 21)
        args = _ref_args("pointnet")
        args.dropout = 0.0
        # SGD (+momentum): the reference's own alternative optimizer
        # (`train_spst.py:161`). Adam's sign-normalized first steps
        # amplify the measured f32 BN-batch-stat noise into ~4% loss
        # divergence within one epoch (cf. TestTrajectory's envelopes);
        # SGD keeps the divergence proportional, so the early-batch
        # gates stay tight enough that a missing 5e-3 weight decay or a
        # wrong LR shows directly in the weighted losses.
        cfg = SPSTConfig(apply_PCM=False, batch_size=self.B_,
                         num_points=self.N_, dropout=0.0, synthetic=True,
                         optimizer="SGD")
        ref = _load_strict(refM.PointNet(args), export_pointnet(v))
        ref.train()
        opt = torch.optim.SGD(ref.parameters(), lr=cfg.lr,
                              momentum=cfg.momentum, weight_decay=cfg.wd)
        sched = torch.optim.lr_scheduler.CosineAnnealingLR(
            opt, T_max=self.EPOCHS)  # created ONCE, cyclic across rounds
        crit = torch.nn.CrossEntropyLoss()
        state = create_train_state(
            model, jax.random.key(0), jnp.zeros((1, self.N_, 3), jnp.float32),
            optimizer=cfg.optimizer, lr=cfg.lr, wd=cfg.wd,
            momentum=cfg.momentum, heads=("defrec",), epoch_lr=True)
        state = state.replace(params=v["params"],
                              batch_stats=v["batch_stats"])

        n_batches = self.ROUNDS * self.EPOCHS * self.ITERS
        tx = rng.standard_normal(
            (n_batches, self.B_, self.N_, 3)).astype(np.float32)
        ty = rng.integers(0, 10, (n_batches, self.B_))
        sx = rng.standard_normal(
            (n_batches, self.B_, self.N_, 3)).astype(np.float32)
        sy = rng.integers(0, 10, (n_batches, self.B_))

        spl, cls_w = cfg.spl_weight, cfg.cls_weight
        bi = 0
        upd_sum = 0.0
        in_floor = step_floor = None
        for rnd in range(self.ROUNDS):
            for epoch in range(self.EPOCHS):
                lr = torch_cosine_lr(cfg.lr, self.EPOCHS,
                                     rnd * self.EPOCHS + epoch)
                state = set_learning_rate(state, lr)
                assert np.isclose(lr, opt.param_groups[0]["lr"], rtol=1e-6)
                for _ in range(self.ITERS):
                    state_prev = state
                    state, m = spst_mod.spst_train_step(
                        state, jnp.asarray(tx[bi]), jnp.asarray(ty[bi]),
                        jnp.asarray(sx[bi]), jnp.asarray(sy[bi]),
                        jnp.float32(spl), jnp.float32(cls_w),
                        jax.random.key(bi), cfg)
                    # per-step update magnitude (inf-norm over the
                    # tree): the unit both loss- and param-envelopes
                    # are derived from
                    upd = max(float(jnp.abs(a - b).max()) for a, b in zip(
                        jax.tree_util.tree_leaves(state.params),
                        jax.tree_util.tree_leaves(state_prev.params)))
                    upd_sum += upd
                    if bi == 0:
                        # in-test chaos floors (cf. TestTrajectory):
                        # (a) INPUT floor — 1e-5-perturbed inputs at
                        # identical params (maxpool tie-flip noise);
                        # (b) STEP floor — params nudged elementwise by
                        # +-(this step's own update magnitude), the
                        # divergence one SGD step can add.
                        _, m_eps = spst_mod.spst_train_step(
                            state_prev, jnp.asarray(tx[bi] + 1e-5),
                            jnp.asarray(ty[bi]),
                            jnp.asarray(sx[bi] + 1e-5),
                            jnp.asarray(sy[bi]), jnp.float32(spl),
                            jnp.float32(cls_w), jax.random.key(bi), cfg)
                        leaves, tdef = jax.tree_util.tree_flatten(
                            state_prev.params)
                        ks = jax.random.split(jax.random.key(99),
                                              len(leaves))
                        _, m_pp = spst_mod.spst_train_step(
                            state_prev.replace(
                                params=jax.tree_util.tree_unflatten(
                                    tdef, [
                                        l + upd * jnp.sign(
                                            jax.random.normal(k, l.shape))
                                        for l, k in zip(leaves, ks)])),
                            jnp.asarray(tx[bi]), jnp.asarray(ty[bi]),
                            jnp.asarray(sx[bi]), jnp.asarray(sy[bi]),
                            jnp.float32(spl), jnp.float32(cls_w),
                            jax.random.key(bi), cfg)
                        in_floor = {b: abs(float(m[b]) - float(m_eps[b]))
                                    for b in ("trgt_cls", "src_cls")}
                        step_floor = {b: abs(float(m[b]) - float(m_pp[b]))
                                      for b in ("trgt_cls", "src_cls")}
                    opt.zero_grad()
                    tl = ref(_cf(tx[bi]), activate_DefRec=False)
                    loss_t = spl * crit(tl["cls"],
                                        torch.from_numpy(ty[bi]))
                    loss_t.backward()
                    sl = ref(_cf(sx[bi]), activate_DefRec=False)
                    loss_s = cls_w * crit(sl["cls"],
                                          torch.from_numpy(sy[bi]))
                    loss_s.backward()
                    opt.step()
                    # Drift decorrelates fully (20-45%) from batch 4 on
                    # — global-maxpool route flips compound per step
                    # exactly as in TestTrajectory. Compare only while
                    # the signal exceeds the chaos (first 4 batches),
                    # with FLOOR-DERIVED envelopes (measured at bi==0 on
                    # this host, so the gate is portable), capped at
                    # half the loss so weight/LR bugs stay catchable;
                    # afterwards keep stepping BOTH stacks so the
                    # scheduler assert covers round 2.
                    if bi < 4:
                        for name, want in (("trgt_cls", float(loss_t)),
                                           ("src_cls", float(loss_s))):
                            tol = (min(6.0 * (1 + bi)
                                       * (in_floor[name]
                                          + step_floor[name]),
                                       0.5 * abs(want))
                                   + 1e-5 * abs(want) + 1e-6)
                            assert abs(float(m[name]) - want) <= tol, (
                                f"batch {bi} {name}: ours "
                                f"{float(m[name]):.6f} vs torch "
                                f"{want:.6f} (tol {tol:.6f})")
                    bi += 1
                spl -= cfg.weight_decay_per_epoch
                cls_w -= cfg.weight_decay_per_epoch
                sched.step()

        # Final params: equality is unobtainable past the chaos horizon
        # (decorrelated route flips), but the UPDATE MAGNITUDE is pinned
        # by lr/momentum — the envelope is twice the SUM of our own
        # per-step update inf-norms (both stacks' updates are the same
        # scale — the loss gates above assert that — so divergence is
        # bounded by the two walks' total movement). Measured: max
        # |delta| 1.4e-2 after all 8 SGD steps; a 10x LR error or a
        # wrong scheduler shape moves params an order of magnitude
        # more.
        # (running BN stats are excluded: they track the activations,
        # which decorrelate with the routes, not the lr-bounded updates)
        back = import_pointnet(
            {k: p.detach() for k, p in
             list(ref.named_parameters()) + list(ref.named_buffers())},
            {"params": state.params, "batch_stats": state.batch_stats})
        flat_t = jax.tree_util.tree_leaves_with_path(back["params"])
        flat_o = jax.tree_util.tree_leaves_with_path(state.params)
        for (kp, a), (_, b) in zip(flat_t, flat_o):
            np.testing.assert_allclose(
                np.asarray(b), np.asarray(a), atol=2.0 * upd_sum,
                err_msg=jax.tree_util.keystr(kp))


@pytest.mark.slow
class TestSPSTSelectionParity:
    """SPST pseudo-label selection vs the REFERENCE'S OWN code.

    `train_spst.py` cannot be imported (module scope parses argv and
    torch.load's checkpoints), so `select_target_by_conf(_v2)`
    (`train_spst.py:239-313`) are extracted from its source with `ast`
    and exec'd against stubbed `args`/`io`/`device` globals — the
    literal reference loop then runs on the SAME torch model our export
    produced, and both stacks must pick the same clouds with the same
    pseudo-labels."""

    M, BS = 26, 8  # uneven last batch on both sides

    @staticmethod
    def _ref_selectors(threshold):
        import ast

        src = open("/root/reference/PointDA/train_spst.py").read()
        fns = [n for n in ast.parse(src).body
               if isinstance(n, ast.FunctionDef)
               and n.name in ("select_target_by_conf",
                              "select_target_by_conf_v2")]
        assert len(fns) == 2
        ns = {
            "torch": torch, "nn": torch.nn, "np": np,
            "args": SimpleNamespace(threshold=threshold),
            "io": SimpleNamespace(print_progress=lambda *a, **k: 0.0,
                                  cprint=lambda s: None),
            "device": torch.device("cpu"),
        }
        exec(compile(ast.Module(body=fns, type_ignores=[]),
                     "<ref train_spst.py selectors>", "exec"), ns)
        return ns

    def _setup(self, tmp_path):
        from mlsp_tpu.train.state import create_train_state
        from mlsp_tpu.utils.logging import IOStream

        model = PointNet(num_classes=10)
        v = _perturb(_init_flax(model, ("defrec",)), 7)
        state = create_train_state(
            model, jax.random.key(0), jnp.zeros((1, N, 3), jnp.float32),
            heads=("defrec",))
        state = state.replace(params=v["params"],
                              batch_stats=v["batch_stats"])
        ref = _load_strict(refM.PointNet(_ref_args("pointnet")),
                           export_pointnet(v))
        rng = np.random.default_rng(11)
        data = rng.standard_normal((self.M, N, 3)).astype(np.float32)
        label = rng.integers(0, 10, self.M)
        loader = [(torch.from_numpy(data[i:i + self.BS]),
                   torch.from_numpy(label[i:i + self.BS]))
                  for i in range(0, self.M, self.BS)]
        io = IOStream(str(tmp_path), "sel")
        return state, ref, data, label, loader, io

    @staticmethod
    def _gap_threshold(values):
        """Midpoint of the widest gap in the middle of the sorted values:
        both stacks' ~1e-5 forward noise cannot flip a sample across it,
        and both sides of the split are nonempty."""
        v = np.sort(values)
        lo, hi = len(v) // 4, 3 * len(v) // 4
        gaps = v[lo + 1:hi + 1] - v[lo:hi]
        i = lo + int(gaps.argmax())
        assert gaps.max() > 1e-4, f"no safe threshold gap: {gaps.max()}"
        return float((v[i] + v[i + 1]) / 2)

    @pytest.mark.parametrize("use_entropy", [True, False],
                             ids=["entropy_v2", "max_prob"])
    def test_same_selection_as_reference(self, tmp_path, use_entropy):
        from mlsp_tpu.train.spst import select_pseudo_labels
        from mlsp_tpu.utils import metrics

        state, ref, data, label, loader, io = self._setup(tmp_path)

        # pick the threshold in a wide gap of the decision statistic
        with torch.no_grad():
            conf = torch.softmax(
                ref(_cf(data), activate_DefRec=False)["cls"], 1)
        if use_entropy:
            stat = -(conf * torch.log_softmax(conf, 1)).sum(1).numpy()
        else:
            stat = conf.max(1).values.numpy()
        thr = self._gap_threshold(stat)

        ns = self._ref_selectors(thr)
        fn = ns["select_target_by_conf_v2" if use_entropy
                else "select_target_by_conf"]
        ref_pcs, ref_labels = fn(loader, ref, epoch=0)

        pcs, plabels = select_pseudo_labels(
            state, data, label, np.arange(self.M), self.BS, thr,
            use_entropy, io, 0)

        assert len(pcs) == len(ref_pcs) and 0 < len(pcs) < self.M
        np.testing.assert_array_equal(plabels, np.asarray(ref_labels))
        # the reference stores the selected clouds PERMUTED [3, N]
        np.testing.assert_array_equal(
            pcs, np.stack([p.T for p in ref_pcs]))


@pytest.mark.slow
class TestExportCLI:
    def test_export_subcommand_end_to_end(self, tmp_path, rng):
        """native .ckpt -> `mlsp-tpu export` -> reference strict load ->
        forward equality vs the originating flax state."""
        from mlsp_tpu.cli import main
        from mlsp_tpu.train.state import create_train_state
        from mlsp_tpu.utils.checkpoint import save_train_state

        model = PointNet(num_classes=10)
        v = _perturb(_init_flax(model, ("defrec",)), 4)
        state = create_train_state(
            model, jax.random.key(0), jnp.zeros((1, N, 3), jnp.float32),
            heads=("defrec",))
        state = state.replace(params=v["params"],
                              batch_stats=v["batch_stats"])
        ckpt = str(tmp_path / "model.ckpt")
        save_train_state(ckpt, state)

        out = str(tmp_path / "model.pt")
        assert main([
            "export", "--model_file", ckpt, "--model", "pointnet",
            "--num_points", str(N), "--output", out,
            "--out_path", str(tmp_path), "--exp_name", "EXP",
        ]) == 0

        ref = _load_strict(
            refM.PointNet(_ref_args("pointnet")),
            {k: t.numpy() for k, t in load_torch_state_dict(out).items()})
        x = _cloud(rng)
        with torch.no_grad():
            want = ref(_cf(x), activate_DefRec=True)
        got = model.apply(v, jnp.asarray(x), train=False, heads=("defrec",))
        np.testing.assert_allclose(
            np.asarray(got["cls"]), want["cls"].numpy(),
            rtol=1e-3, atol=1e-3)

    def test_model_task_mismatch_rejected(self, tmp_path):
        from mlsp_tpu.train.evaluation import run_export
        from mlsp_tpu.utils.config import EvalConfig

        # NB: (task=pointsegda, model=dgcnn) cannot reach the check —
        # resolved() rewrites the pointda-default model to dgcnn_seg.
        with pytest.raises(ValueError, match="does not belong to task"):
            run_export(EvalConfig(task="pointsegda", model="pointnet",
                                  model_file="x.ckpt",
                                  out_path=str(tmp_path)))
        with pytest.raises(ValueError, match="does not belong to task"):
            run_export(EvalConfig(task="pointda", model="dgcnn_seg",
                                  model_file="x.ckpt",
                                  out_path=str(tmp_path)))
        with pytest.raises(ValueError, match="export supports"):
            # pointnet2 has no reference state_dict to target
            run_export(EvalConfig(model="pointnet2", model_file="x.ckpt",
                                  out_path=str(tmp_path)))

    def test_hengshuang_seg_export_end_to_end(self, tmp_path):
        """Regression: the seg branch must construct the model named by
        the config (it used to hardcode DGCNNSeg, so hengshuang_seg
        export was dead on arrival)."""
        from mlsp_tpu.models.hengshuang import HengshuangSeg
        from mlsp_tpu.train.evaluation import run_export
        from mlsp_tpu.train.state import create_train_state
        from mlsp_tpu.utils import checkpoint
        from mlsp_tpu.utils.config import EvalConfig

        model = HengshuangSeg(num_classes=8, nblocks=2, nneighbor=8,
                              d_model=64)
        state = create_train_state(
            model, jax.random.key(0), jnp.zeros((1, 64, 3), jnp.float32),
            heads=("seg", "defrec"))
        ckpt = str(tmp_path / "h.ckpt")
        checkpoint.save_train_state(ckpt, state)
        # NB: default nblocks=4 in run_export's model, so export with a
        # matching full-size model would need config plumbing; here we
        # assert the RIGHT MODEL CLASS is constructed — a structure
        # mismatch against the checkpoint proves it reached the
        # HengshuangSeg loader rather than silently building DGCNNSeg.
        with pytest.raises(ValueError, match="hengshuang|structure"):
            run_export(EvalConfig(
                task="pointsegda", model="hengshuang_seg",
                model_file=ckpt, out_path=str(tmp_path),
                output=str(tmp_path / "h.pt")))
