"""Tests for the long-tail inventory: transformer model, extra transforms,
meta loader, optimizer factory, YAML config, meters, profiling."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mlsp_tpu.transforms import extra as X


class TestPointTransformer:
    def test_forward_and_defrec(self, rng):
        from mlsp_tpu.models.transformer import PointTransformer

        m = PointTransformer(num_classes=10, trans_dim=64, depth=2, heads=4,
                             num_group=8, group_size=8, fetch_idx=(0, 1))
        x = jnp.asarray(rng.standard_normal((2, 64, 3)), jnp.float32)
        v = jax.jit(
            lambda r, x: m.init({"params": r}, x, train=False, heads=("defrec",))
        )(jax.random.key(0), x)
        out = m.apply(v, x, train=False, heads=("defrec",))
        assert out["cls"].shape == (2, 10)
        assert out["defrec"].shape == (2, 64, 3)

    def test_feature_propagation_exact_at_sources(self, rng):
        from mlsp_tpu.models.transformer import feature_propagation

        src = jnp.asarray(rng.standard_normal((1, 16, 3)), jnp.float32)
        f = jnp.asarray(rng.standard_normal((1, 16, 4)), jnp.float32)
        out = feature_propagation(src, src, f)
        # At a source point the nearest neighbour is itself with weight ~1.
        np.testing.assert_allclose(np.asarray(out), np.asarray(f), atol=1e-3)

    def test_factory(self):
        from mlsp_tpu.models import make_model
        from mlsp_tpu.models.transformer import PointTransformer

        assert isinstance(make_model("point_transformer", 10), PointTransformer)


class TestExtraTransforms:
    def test_scale_range(self, rng):
        x = jnp.ones((2, 16, 3))
        s = np.asarray(X.scale(jax.random.key(0), x))
        assert (s >= 2 / 3 - 1e-6).all() and (s <= 1.5 + 1e-6).all()
        # one scalar per cloud
        assert np.unique(np.round(s[0], 6)).size == 1

    def test_rotate_perturbation_small(self, rng):
        x = jnp.asarray(rng.standard_normal((2, 64, 3)), jnp.float32)
        r = np.asarray(X.rotate_perturbation(jax.random.key(1), x))
        np.testing.assert_allclose(
            np.linalg.norm(r, axis=-1), np.asarray(jnp.linalg.norm(x, axis=-1)),
            atol=1e-4,
        )
        assert np.abs(r - np.asarray(x)).max() < 0.5  # small angles

    def test_drop_hole_fraction(self, rng):
        x = jnp.asarray(rng.standard_normal((2, 100, 3)), jnp.float32)
        _, keep = X.drop_hole(jax.random.key(2), x, p=0.25)
        frac = np.asarray(keep).mean(-1)
        assert ((frac > 0.6) & (frac < 0.85)).all()

    def test_viewpoint_dropout(self, rng):
        x = jnp.asarray(rng.standard_normal((4, 256, 3)), jnp.float32)
        _, keep = X.viewpoint_dropout(jax.random.key(3), x)
        k = np.asarray(keep)
        assert 0.2 < k.mean() < 0.95
        # nearest-to-viewpoint points survive more often than farthest
        d = np.linalg.norm(np.asarray(x) - np.array([1.0, 0, 0]), axis=-1)
        near = k[d < np.median(d)].mean()
        far = k[d >= np.median(d)].mean()
        assert near > far

    def test_normalize_pc(self, rng):
        x = jnp.asarray(rng.standard_normal((2, 32, 3)) * 7 + 3, jnp.float32)
        n = np.asarray(X.normalize_pc(x))
        np.testing.assert_allclose(np.linalg.norm(n, axis=-1).max(-1), 1.0, atol=1e-5)


class TestMetaLoader:
    def test_padding_and_split(self, tmp_path, rng):
        from mlsp_tpu.data.meta import load_padded_npy

        for cls in ("a", "b"):
            os.makedirs(tmp_path / cls)
            for i in range(12):
                np.save(tmp_path / cls / f"{i}.npy",
                        rng.standard_normal((50 + i, 3)).astype(np.float32))
        ds = load_padded_npy(str(tmp_path), num_points=64)
        assert ds.data.shape == (24, 64, 3)
        assert set(ds.label) == {0, 1}
        # zero padding beyond the true size
        assert (ds.data[0, 50:] == 0).all()
        assert len(ds.train_ind) == 20 and len(ds.val_ind) == 4


class TestOptimizerFactory:
    @pytest.mark.parametrize("name,sched", [
        ("ADAM", "cos"), ("SGD", "cos"), ("ADAMW", "step"), ("ADAM", "const"),
    ])
    def test_variants_step(self, name, sched, rng):
        import optax
        from mlsp_tpu.train.state import make_optimizer

        tx = make_optimizer(name, 1e-3, 1e-4, 0.9, 10, 5, scheduler=sched)
        params = {"w": jnp.ones((4, 4)), "b": jnp.zeros((4,))}
        st = tx.init(params)
        g = jax.tree_util.tree_map(jnp.ones_like, params)
        up, st = tx.update(g, st, params)
        assert all(bool(jnp.isfinite(u).all()) for u in jax.tree_util.tree_leaves(up))

    def test_cosine_endpoints(self):
        from mlsp_tpu.train.state import cosine_per_epoch

        s = cosine_per_epoch(1.0, 100, 10)
        np.testing.assert_allclose(float(s(0)), 1.0)
        np.testing.assert_allclose(float(s(50 * 10)), 0.5, atol=1e-6)
        np.testing.assert_allclose(float(s(100 * 10)), 0.0, atol=1e-6)

    def test_spst_cyclic_cosine(self):
        """torch CosineAnnealingLR(T_max=20) stepped 40 epochs across 2
        SPST rounds is CYCLIC: decays to 0 at epoch 20, then rises back
        (`train_spst.py:163,501`). Pin epochs 0/19/20/39."""
        from mlsp_tpu.train.state import torch_cosine_lr

        base, T = 1e-3, 20
        np.testing.assert_allclose(torch_cosine_lr(base, T, 0), base)
        np.testing.assert_allclose(
            torch_cosine_lr(base, T, 19),
            base * 0.5 * (1 + np.cos(np.pi * 19 / 20)), rtol=1e-12)
        np.testing.assert_allclose(torch_cosine_lr(base, T, 20), 0.0,
                                   atol=1e-18)
        # round 2 end: nearly back at base lr
        np.testing.assert_allclose(
            torch_cosine_lr(base, T, 39),
            base * 0.5 * (1 + np.cos(np.pi * 39 / 20)), rtol=1e-12)
        assert torch_cosine_lr(base, T, 39) > 0.99 * base

    def test_epoch_lr_optimizer_set_lr(self):
        """`set_learning_rate` drives the injected LR: lr=0 leaves params
        unchanged; the opt-state pytree structure is preserved."""
        import jax
        from mlsp_tpu.train.state import (
            TrainState, make_epoch_lr_optimizer, set_learning_rate,
        )

        tx = make_epoch_lr_optimizer("ADAM", 1e-3, 1e-4, 0.9)
        params = {"w": jnp.ones((4, 4))}
        state = TrainState.create(apply_fn=None, params=params, tx=tx)
        g = jax.tree_util.tree_map(jnp.ones_like, params)

        s0 = set_learning_rate(state, 0.0)
        assert (jax.tree_util.tree_structure(s0.opt_state)
                == jax.tree_util.tree_structure(state.opt_state))
        s0 = s0.apply_gradients(grads=g)
        np.testing.assert_array_equal(np.asarray(s0.params["w"]), 1.0)

        s1 = set_learning_rate(state, 1e-2).apply_gradients(grads=g)
        assert float(jnp.abs(s1.params["w"] - 1.0).max()) > 1e-4


class TestChunkedEval:
    def test_matches_unchunked(self, rng):
        """Bounded-chunk eval (oversized split vs tiny chunk) is exactly
        the one-dispatch result."""
        import jax
        from mlsp_tpu.models import make_model
        from mlsp_tpu.train.pointda_trainer import evaluate
        from mlsp_tpu.train.state import create_train_state

        model = make_model("pointnet", 4)
        data = rng.standard_normal((50, 64, 3)).astype(np.float32)
        label = rng.integers(0, 4, 50).astype(np.int64)
        state = create_train_state(model, jax.random.key(0),
                                   jnp.zeros((8, 64, 3)), heads=())
        a = evaluate(state, data, label, 8, 4, chunk=2)
        b = evaluate(state, data, label, 8, 4, chunk=100)
        assert a["acc"] == b["acc"]
        np.testing.assert_allclose(a["loss"], b["loss"], rtol=1e-6)
        np.testing.assert_array_equal(a["conf_mat"], b["conf_mat"])


class TestConfigYaml:
    def test_base_inheritance(self, tmp_path):
        from mlsp_tpu.utils.config import PointDAConfig, load_yaml

        (tmp_path / "base.yaml").write_text("epochs: 5\nlr: 0.01\n")
        (tmp_path / "child.yaml").write_text("_base_: base.yaml\nlr: 0.1\n")
        cfg = load_yaml(PointDAConfig, str(tmp_path / "child.yaml"))
        assert cfg.epochs == 5 and cfg.lr == 0.1

    def test_unknown_key_rejected(self, tmp_path):
        from mlsp_tpu.utils.config import PointDAConfig, load_yaml

        (tmp_path / "bad.yaml").write_text("nonsense_key: 1\n")
        with pytest.raises(ValueError, match="nonsense_key"):
            load_yaml(PointDAConfig, str(tmp_path / "bad.yaml"))

    def test_debug_fields_rejected_from_yaml_and_cli(self, tmp_path):
        """debug_aux/debug_bn_eval are test-only instrumentation
        (debug_bn_eval changes training semantics): constructor-only,
        rejected by the YAML funnel and absent from the CLI surface."""
        import argparse

        from mlsp_tpu import cli
        from mlsp_tpu.utils.config import (
            PointDAConfig, PointSegDAConfig, load_yaml,
        )

        (tmp_path / "dbg.yaml").write_text("debug_bn_eval: true\n")
        with pytest.raises(ValueError, match="test-only"):
            load_yaml(PointDAConfig, str(tmp_path / "dbg.yaml"))
        (tmp_path / "dbg2.yaml").write_text("debug_aux: true\n")
        with pytest.raises(ValueError, match="test-only"):
            load_yaml(PointSegDAConfig, str(tmp_path / "dbg2.yaml"))

        p = argparse.ArgumentParser()
        cli._add_config_args(p, PointDAConfig)
        with pytest.raises(SystemExit):  # argparse: unrecognized argument
            p.parse_args(["--debug_aux", "true"])
        # direct construction (what tests do) still works
        assert PointDAConfig(debug_aux=True).debug_aux

    def test_repo_configs_load(self):
        from mlsp_tpu.utils.config import PointDAConfig, load_yaml

        cfg = load_yaml(
            PointDAConfig,
            os.path.join(os.path.dirname(__file__), "..", "configs",
                         "pointda_paper.yaml"),
        )
        assert cfg.Density_normal_viainput and cfg.epochs == 150

    def test_every_shipped_config_loads(self):
        """All 6 PointDA + 12 PointSegDA per-pair recipes, the SPST stage,
        and the model-variant configs parse into their dataclasses."""
        import glob

        from mlsp_tpu.utils.config import (
            PointDAConfig, PointSegDAConfig, SPSTConfig, load_yaml,
        )

        root = os.path.join(os.path.dirname(__file__), "..", "configs")
        pairs = glob.glob(os.path.join(root, "pointda", "*.yaml"))
        assert len(pairs) == 6
        for p in pairs:
            cfg = load_yaml(PointDAConfig, p).resolved()
            assert cfg.src_dataset != cfg.trgt_dataset
            assert cfg.Density_normal_viainput  # paper recipe inherited
        seg_pairs = glob.glob(os.path.join(root, "pointsegda", "*.yaml"))
        assert len(seg_pairs) == 12
        for p in seg_pairs:
            cfg = load_yaml(PointSegDAConfig, p).resolved()
            assert cfg.src_dataset != cfg.trgt_dataset
            assert cfg.Density_normal_viainput and not cfg.DefRec_on_trgt
        spst = load_yaml(SPSTConfig, os.path.join(root, "spst_paper.yaml"))
        assert spst.rounds == 2 and spst.epochs == 20
        for name, model in [("pointda_pointtransformer.yaml", "point_transformer"),
                            ("pointda_hengshuang.yaml", "hengshuang"),
                            ("pointda_vit.yaml", "vit")]:
            cfg = load_yaml(PointDAConfig, os.path.join(root, name))
            assert cfg.model == model

        # Every shipped PointDA config must be ACCEPTED by the trainer's
        # head validation, not just parse (a transformer config that
        # inherits dgcnn-only SSL branches would die at startup).
        from mlsp_tpu.utils.config import validate_heads

        for p in pairs + [os.path.join(root, n) for n in (
                "pointda_paper.yaml", "pointda_base.yaml",
                "pointda_pointtransformer.yaml", "pointda_hengshuang.yaml",
                "pointda_vit.yaml")]:
            validate_heads(load_yaml(PointDAConfig, p).resolved())

    def test_validate_heads_rejects_mismatch(self):
        from mlsp_tpu.utils.config import PointDAConfig, validate_heads

        with pytest.raises(ValueError, match="no \\['density', 'normal'\\]"):
            validate_heads(PointDAConfig(model="pointnet",
                                         Density_normal_viainput=True))
        assert validate_heads(PointDAConfig(model="dgcnn",
                                            Density_normal_viainput=True)) == (
            "defrec", "normal", "scan", "density")

    def test_cli_flags_override_yaml(self):
        """--config + explicit flags compose: defaults < YAML < flags."""
        import argparse

        from mlsp_tpu import cli
        from mlsp_tpu.utils.config import PointDAConfig

        p = argparse.ArgumentParser()
        cli._add_config_args(p, PointDAConfig)
        path = os.path.join(os.path.dirname(__file__), "..", "configs",
                            "pointda", "modelnet2scannet.yaml")
        args = p.parse_args(["--config", path, "--epochs", "3",
                             "--Density_ondef", "false"])
        cfg = cli._to_config(PointDAConfig, args)
        assert cfg.epochs == 3  # flag overrides YAML's inherited 150
        assert not cfg.Density_ondef  # flag overrides YAML's true
        assert cfg.src_dataset == "modelnet" and cfg.trgt_dataset == "scannet"
        assert cfg.Density_normal_viainput  # YAML overrides default false
        assert cfg.batch_size == 32  # untouched default passes through


class TestSmallUtils:
    def test_model_summary_counts(self):
        import numpy as np

        from mlsp_tpu.utils.summary import model_summary

        params = {
            "Dense_0": {"kernel": np.zeros((3, 4)), "bias": np.zeros(4)},
            "Head": {"Dense_0": {"kernel": np.zeros((4, 2))}},
        }
        s = model_summary(params)
        assert "Dense_0" in s and "16" in s  # 3*4 + 4
        assert "Total params" in s and "24" in s  # 16 + 8

    def test_download_graceful_without_network(self, tmp_path, monkeypatch):
        import subprocess

        from mlsp_tpu.data import download

        def no_gdown(*a, **k):
            raise OSError("gdown not found")

        monkeypatch.setattr(subprocess, "run", no_gdown)
        with pytest.raises(RuntimeError, match="synthetic"):
            download.download_pointda(str(tmp_path))

    def test_download_skips_existing_archive(self, tmp_path, monkeypatch):
        import subprocess
        import zipfile

        from mlsp_tpu.data import download

        # pre-place the archive: no network call may happen
        dest = tmp_path / "PointDA_data.zip"
        with zipfile.ZipFile(dest, "w") as z:
            z.writestr("PointDA_data/readme.txt", "hi")

        def boom(*a, **k):
            raise AssertionError("network call despite existing archive")

        monkeypatch.setattr(subprocess, "run", boom)
        out = download.download_pointda(str(tmp_path))
        assert (tmp_path / "PointDA_data" / "readme.txt").read_text() == "hi"
        assert out == str(tmp_path)

    def test_download_cli_wiring(self, tmp_path, monkeypatch):
        import zipfile

        from mlsp_tpu.cli import main

        dest = tmp_path / "PointSegDAdataset.zip"
        with zipfile.ZipFile(dest, "w") as z:
            z.writestr("PointSegDAdataset/adobe/train/0.npy", "x")
        rc = main(["download", "--task", "pointsegda",
                   "--dataroot", str(tmp_path)])
        assert rc == 0
        assert (tmp_path / "PointSegDAdataset" / "adobe" / "train"
                / "0.npy").exists()

    def test_timed_fetch_and_scan(self):
        import jax.numpy as jnp

        from mlsp_tpu.utils.timing import timed_fetch, timed_scan

        dt = timed_fetch(lambda x: x * 2.0, jnp.float32(3.0), trials=1)
        assert dt > 0.0
        xs = jnp.ones((4, 2), jnp.float32)
        per_it = timed_scan(lambda x: jnp.sum(x), xs, S=4, trials=1)
        assert per_it > 0.0


class TestMeters:
    def test_average_meter_weighted(self):
        from mlsp_tpu.utils.average_meter import AverageMeter

        m = AverageMeter()
        m.update(1.0, n=3)
        m.update(5.0, n=1)
        assert m.avg == 2.0  # (1*3 + 5*1) / 4
        assert m.val == 5.0 and m.count == 4

    def test_meter_dict_scan_metrics(self):
        import numpy as np

        from mlsp_tpu.utils.average_meter import MeterDict

        md = MeterDict()
        # [S]-stacked scan metrics: each step weighted by the batch size
        md.update({"loss": np.array([1.0, 3.0])}, n=4)
        md.update({"loss": 5.0, "acc": 0.5}, n=4)
        avg = md.averages()
        # loss: (1*4 + 3*4 + 5*4) / 12 = 3.0
        assert avg["loss"] == 3.0 and avg["acc"] == 0.5
        assert md["loss"].count == 12


class TestProfiling:
    def test_log_execution_time(self, capsys):
        from mlsp_tpu.utils.profiling import log_execution_time

        @log_execution_time
        def f():
            return 7

        assert f() == 7
        assert "[f] took" in capsys.readouterr().out


class TestHengshuang:
    def test_forward_defrec_and_factory(self, rng):
        from mlsp_tpu.models import make_model
        from mlsp_tpu.models.hengshuang import HengshuangTransformer

        m = make_model("hengshuang", 10, nblocks=2, nneighbor=8,
                       d_model=32, base_dim=16)
        assert isinstance(m, HengshuangTransformer)
        x = jnp.asarray(rng.standard_normal((2, 128, 3)), jnp.float32)
        v = jax.jit(
            lambda r, xx: m.init({"params": r}, xx, train=False, heads=("defrec",))
        )(jax.random.key(0), x)
        out = m.apply(v, x, train=False, heads=("defrec",))
        assert out["cls"].shape == (2, 10)
        assert out["defrec"].shape == (2, 128, 3)
        assert bool(jnp.isfinite(out["cls"]).all())

    def test_seg_variant_shapes(self, rng):
        """`PointTransformerSeg` analog: per-point logits + DefRec."""
        from mlsp_tpu.models import make_model
        from mlsp_tpu.models.hengshuang import HengshuangSeg

        m = make_model("hengshuang_seg", 8, nblocks=2, nneighbor=8,
                       d_model=32, base_dim=16)
        assert isinstance(m, HengshuangSeg)
        x = jnp.asarray(rng.standard_normal((2, 128, 3)), jnp.float32)
        v = jax.jit(
            lambda r, xx: m.init({"params": r}, xx, train=False,
                                 heads=("seg", "defrec"))
        )(jax.random.key(0), x)
        out = m.apply(v, x, train=False, heads=("seg", "defrec"))
        assert out["seg"].shape == (2, 128, 8)
        assert out["defrec"].shape == (2, 128, 3)
        assert bool(jnp.isfinite(out["seg"]).all())

    def test_validate_seg_heads(self):
        from mlsp_tpu.utils.config import PointSegDAConfig, validate_seg_heads

        ok = PointSegDAConfig(model="hengshuang_seg")  # DefRec_on_trgt only
        assert validate_seg_heads(ok) == ("seg", "defrec")
        bad = PointSegDAConfig(model="hengshuang_seg", Norm_on_trgt=True)
        with pytest.raises(ValueError, match="normal"):
            validate_seg_heads(bad)


@pytest.mark.slow
class TestCLIConfig:
    def test_yaml_config_run(self, tmp_path):
        from mlsp_tpu.cli import main

        (tmp_path / "exp.yaml").write_text(
            "synthetic: true\nepochs: 1\nbatch_size: 8\nnum_points: 64\n"
            f"model: pointnet\napply_PCM: false\ntest_batch_size: 8\n"
            f"out_path: {tmp_path}\nexp_name: ycfg\n"
        )
        rc = main(["trainer", "--config", str(tmp_path / "exp.yaml")])
        assert rc == 0
        assert (tmp_path / "ycfg" / "run.log").exists()
        assert (tmp_path / "ycfg" / "Target_test_conf_mat.csv").exists()


@pytest.mark.slow
class TestEvalCLI:
    def test_eval_after_training(self, tmp_path):
        """Train tiny -> `mlsp-tpu eval` the saved checkpoint standalone."""
        from mlsp_tpu.cli import main

        rc = main([
            "trainer", "--synthetic", "1", "--epochs", "1", "--batch_size",
            "8", "--num_points", "64", "--model", "pointnet", "--apply_PCM",
            "0", "--test_batch_size", "8", "--out_path", str(tmp_path),
            "--exp_name", "pre",
        ])
        assert rc == 0
        ckpt = tmp_path / "pre" / "model.ckpt"
        assert ckpt.exists()
        rc = main([
            "eval", "--model_file", str(ckpt), "--model", "pointnet",
            "--dataset", "scannet", "--split", "test", "--synthetic", "1",
            "--num_points", "64", "--test_batch_size", "8",
            "--out_path", str(tmp_path), "--exp_name", "ev",
        ])
        assert rc == 0
        log = (tmp_path / "ev" / "run.log").read_text()
        assert '"acc"' in log and '"balanced_acc"' in log
        assert (tmp_path / "ev" / "Eval_eval_conf_mat.csv").exists()

    def test_eval_seg_task(self, tmp_path):
        """run_eval drives the segmentation eval from a saved state."""
        import jax
        import jax.numpy as jnp

        from mlsp_tpu.models import DGCNNSeg
        from mlsp_tpu.train.evaluation import run_eval
        from mlsp_tpu.train.state import create_train_state
        from mlsp_tpu.utils import checkpoint
        from mlsp_tpu.utils.config import EvalConfig

        model = DGCNNSeg(num_classes=8, knn_backend="xla")
        sample = jnp.zeros((4, 64, 3), jnp.float32)
        state = create_train_state(
            model, jax.random.key(0), sample,
            heads=("seg", "defrec", "normal", "density"))
        path = str(tmp_path / "seg.ckpt")
        checkpoint.save_train_state(path, state, 0, {})
        r = run_eval(EvalConfig(
            task="pointsegda", dataset="faust", split="test", synthetic=True,
            model="dgcnn_seg", model_file=path, num_class=8, num_points=64,
            test_batch_size=4, out_path=str(tmp_path), exp_name="segev",
        ))
        assert set(r) == {"dataset", "split", "loss", "miou", "acc"}
        assert 0.0 <= r["miou"] <= 1.0

    def test_infer_writes_predictions(self, tmp_path):
        """`mlsp-tpu infer` exports pred/prob/label/index arrays whose
        accuracy agrees with `eval` on the same checkpoint and split."""
        import jax
        import jax.numpy as jnp
        import numpy as np

        from mlsp_tpu.models import make_model
        from mlsp_tpu.train.evaluation import run_eval, run_infer
        from mlsp_tpu.train.state import create_train_state
        from mlsp_tpu.utils import checkpoint
        from mlsp_tpu.utils.config import EvalConfig

        model = make_model("pointnet", 10)
        state = create_train_state(
            model, jax.random.key(0), jnp.zeros((8, 64, 3), jnp.float32),
            heads=("defrec",))
        path = str(tmp_path / "m.ckpt")
        checkpoint.save_train_state(path, state, 0, {})
        cfg = EvalConfig(
            model="pointnet", model_file=path, dataset="scannet",
            split="val", synthetic=True, num_points=64, test_batch_size=8,
            out_path=str(tmp_path), exp_name="inf")
        s = run_infer(cfg)
        with np.load(s["output"]) as z:
            pred, prob, label, index = z["pred"], z["prob"], z["label"], z["index"]
        assert pred.shape == label.shape == index.shape == (s["n"],)
        assert prob.shape == (s["n"], 10)
        np.testing.assert_allclose(prob.sum(-1), 1.0, atol=1e-5)
        assert np.array_equal(prob.argmax(-1), pred)
        assert s["acc"] == pytest.approx(float(np.mean(pred == label)))
        # val-split subset: indices point back into the dataset rows
        assert np.unique(index).shape[0] == s["n"]
        r = run_eval(cfg)
        assert r["acc"] == pytest.approx(s["acc"])

    def test_infer_seg_per_point(self, tmp_path):
        """Segmentation inference emits per-point predictions."""
        import jax
        import jax.numpy as jnp
        import numpy as np

        from mlsp_tpu.models import DGCNNSeg
        from mlsp_tpu.train.evaluation import run_infer
        from mlsp_tpu.train.state import create_train_state
        from mlsp_tpu.utils import checkpoint
        from mlsp_tpu.utils.config import EvalConfig

        model = DGCNNSeg(num_classes=8, knn_backend="xla")
        state = create_train_state(
            model, jax.random.key(0), jnp.zeros((4, 64, 3), jnp.float32),
            heads=("seg", "defrec", "normal", "density"))
        path = str(tmp_path / "seg.ckpt")
        checkpoint.save_train_state(path, state, 0, {})
        s = run_infer(EvalConfig(
            task="pointsegda", dataset="faust", split="test", synthetic=True,
            model="dgcnn_seg", model_file=path, num_points=64,
            test_batch_size=4, out_path=str(tmp_path), exp_name="seginf",
            output=str(tmp_path / "segpred.npz")))
        with np.load(s["output"]) as z:
            assert z["pred"].shape == z["label"].shape  # [M, N]
            assert z["pred"].ndim == 2 and z["prob"].shape[-1] == 8

    def test_eval_missing_file_raises(self, tmp_path):
        from mlsp_tpu.train.evaluation import run_eval
        from mlsp_tpu.utils.config import EvalConfig

        with pytest.raises(FileNotFoundError):
            run_eval(EvalConfig(
                model_file=str(tmp_path / "nope.ckpt"), synthetic=True,
                num_points=64, test_batch_size=8, out_path=str(tmp_path),
                exp_name="missing",
            ))

    def test_shape_mismatch_diagnosed(self, tmp_path):
        """Same tree structure but wrong leaf shapes (e.g. a 10-class
        checkpoint into an 8-class model) must raise a named diagnostic —
        flax's from_state_dict would otherwise adopt the wrong-shaped
        arrays silently."""
        import jax
        import jax.numpy as jnp

        from mlsp_tpu.models import make_model
        from mlsp_tpu.train.state import create_train_state
        from mlsp_tpu.utils import checkpoint

        sample = jnp.zeros((2, 64, 3), jnp.float32)

        def _state(num_class):
            return create_train_state(
                make_model("pointnet", num_class), jax.random.key(0),
                sample, heads=("defrec",))

        path = str(tmp_path / "ten.ckpt")
        checkpoint.save_train_state(path, _state(10), 0, {})
        with pytest.raises(ValueError, match="shapes do not match"):
            checkpoint.load_train_state(path, _state(8),
                                        with_optimizer=False)


class TestTransformerTrainers:
    @pytest.mark.slow
    @pytest.mark.parametrize("model", ["point_transformer", "hengshuang", "vit"])
    def test_trainer_e2e(self, model, tmp_path):
        """Both transformer backbones run the FULL PointDA trainer loop
        (DefRec SSL head, eval, checkpointing) on synthetic data."""
        from mlsp_tpu.train import train_pointda
        from mlsp_tpu.utils.config import PointDAConfig

        cfg = PointDAConfig(
            model=model, synthetic=True, epochs=1, batch_size=8,
            num_points=64, test_batch_size=8, apply_PCM=False,
            scan_steps=4, out_path=str(tmp_path), exp_name=f"t_{model}",
        )
        _, results = train_pointda(cfg)
        assert 0.0 <= results["test"]["acc"] <= 1.0
        assert (tmp_path / f"t_{model}" / "model.ckpt").exists()


class TestEvalConfigDefaults:
    def test_seg_task_flips_pointda_defaults(self):
        """`--task pointsegda` must not keep the PointDA 10-class /
        1024-point / pergroup-2 defaults (the seg trainer uses 8 / 2048 /
        5 — PointSegDA/trainer.py:124-125,196-199)."""
        from mlsp_tpu.utils.config import EvalConfig

        cfg = EvalConfig(task="pointsegda").resolved()
        assert (cfg.model, cfg.num_class, cfg.num_points, cfg.pergroup,
                cfg.dataset) == ("dgcnn_seg", 8, 2048, 5.0, "faust")

    def test_explicit_values_win(self):
        from mlsp_tpu.utils.config import EvalConfig

        cfg = EvalConfig(task="pointsegda", num_points=64,
                         model="hengshuang_seg").resolved()
        assert cfg.num_points == 64 and cfg.model == "hengshuang_seg"
        assert cfg.num_class == 8  # untouched field still flips

    def test_pointda_task_untouched(self):
        from mlsp_tpu.utils.config import EvalConfig

        cfg = EvalConfig()
        assert cfg.resolved() == cfg


class TestMetricsLog:
    def test_trim_metrics_resume_contract(self, tmp_path):
        """A resumed run must not leave duplicate per-epoch records."""
        from mlsp_tpu.utils.logging import IOStream

        io = IOStream(str(tmp_path), "m")
        for e in range(4):
            io.log_metrics({"epoch": e, "x": e * 10})
        io.trim_metrics(2)  # resume from epoch 2: drop 2, 3
        io.log_metrics({"epoch": 2, "x": 999})
        import json

        recs = [json.loads(l) for l in
                (tmp_path / "m" / "metrics.jsonl").read_text().splitlines()]
        assert [r["epoch"] for r in recs] == [0, 1, 2]
        assert recs[-1]["x"] == 999
        io.trim_metrics(0)  # fresh-run truncation
        assert (tmp_path / "m" / "metrics.jsonl").read_text() == ""


class TestHeadExclusiveModules:
    """`state.head_exclusive_modules` derives the frozen-module set from
    the MODEL (eval_shape param-tree diff), not a name table — it must
    catch head-private auto-named submodules (ADVICE r3: hengshuang's
    defrec branch instantiates a UpDecoder that a static table misses,
    so SPST with --model hengshuang would weight-decay frozen-head
    decoder params) and must NOT freeze modules shared with trained
    heads."""

    def test_hengshuang_defrec_owns_updecoder(self):
        import jax
        import jax.numpy as jnp

        from mlsp_tpu.models import make_model
        from mlsp_tpu.train.state import head_exclusive_modules

        model = make_model("hengshuang", 10, nblocks=2, nneighbor=4,
                           d_model=32, base_dim=8)
        mods = head_exclusive_modules(
            model, jnp.zeros((1, 64, 3), jnp.float32),
            heads=("defrec",), untrained_heads=("defrec",))
        assert "DefRec" in mods
        assert any(m.startswith("UpDecoder") for m in mods), mods

    def test_hengshuang_seg_shared_decoder_not_frozen(self):
        import jax.numpy as jnp

        from mlsp_tpu.models import make_model
        from mlsp_tpu.train.state import head_exclusive_modules

        model = make_model("hengshuang_seg", 8, nblocks=2, nneighbor=4,
                           d_model=32, base_dim=8)
        mods = head_exclusive_modules(
            model, jnp.zeros((1, 64, 3), jnp.float32),
            heads=("seg", "defrec"), untrained_heads=("defrec",))
        assert "DefRec" in mods
        # the seg head (always trained) also consumes the UpDecoder:
        # it must NOT drop out of the tree, i.e. must stay trainable
        assert not any(m.startswith("UpDecoder") for m in mods), mods

    def test_unknown_head_raises(self):
        import jax.numpy as jnp
        import pytest as _pytest

        from mlsp_tpu.models import make_model
        from mlsp_tpu.train.state import head_exclusive_modules

        model = make_model("pointnet", 10)
        with _pytest.raises(ValueError, match="not in the model's head"):
            head_exclusive_modules(
                model, jnp.zeros((1, 64, 3), jnp.float32),
                heads=("defrec",), untrained_heads=("nope",))
