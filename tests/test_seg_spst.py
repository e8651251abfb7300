"""PointSegDA + SPST end-to-end tests (tiny synthetic, CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mlsp_tpu.data import synthetic
from mlsp_tpu.models import DGCNNSeg
from mlsp_tpu.train import create_train_state, seg_steps
from mlsp_tpu.utils.config import PointSegDAConfig, SPSTConfig

pytestmark = pytest.mark.e2e  # full trainer loops, multi-minute

B, N = 4, 64


def seg_cfg(**kw):
    base = dict(batch_size=B, synthetic=True, epochs=2, density_radius=0.3)
    base.update(kw)
    return PointSegDAConfig(**base)


class TestSegStep:
    # function-scoped: the train step donates its input state buffers
    @pytest.fixture()
    def setup(self):
        sx, sy = synthetic.make_segmentation(B, N, seed=1)
        tx, _ = synthetic.make_segmentation(B, N, seed=2)
        model = DGCNNSeg(num_classes=8, k=8)
        state = create_train_state(
            model, jax.random.key(0), jnp.zeros((B, N, 3), jnp.float32),
            epochs=2, steps_per_epoch=2,
            heads=("seg", "defrec", "normal", "density"),
        )
        return state, sx, sy, tx

    def test_basic_defrec(self, setup):
        state, sx, sy, tx = setup
        cfg = seg_cfg(DefRec_on_trgt=True)
        state, m, (preds, ly) = seg_steps.pointsegda_train_step(
            state, jnp.asarray(sx), jnp.asarray(sy), jnp.asarray(tx),
            jax.random.key(1), cfg,
        )
        assert np.isfinite(float(m["total"]))
        assert "src_seg" in m and "trgt_DefRec" in m
        assert preds.shape == (B, N)

    def test_full_recipe_with_pcm(self, setup):
        state, sx, sy, tx = setup
        cfg = seg_cfg(
            apply_PCM=True, DefRec_on_trgt=False,
            Density_normal_viainput=True, Normal_ondef=True, Density_ondef=True,
        )
        state, m, _ = seg_steps.pointsegda_train_step(
            state, jnp.asarray(sx), jnp.asarray(sy), jnp.asarray(tx),
            jax.random.key(2), cfg,
        )
        for name in ("src_seg", "trgt_DefRec", "trgt_def_normal",
                     "trgt_def_density_cls"):
            assert np.isfinite(float(m[name])), name

    def test_radius_deform_dispatch(self, setup):
        """`--DefRec_dist volume_based_radius` reaches the seg step's
        deform sites (`PointSegDA/trainer.py:332,400` pass the flag)."""
        from mlsp_tpu import transforms as T

        state, sx, sy, tx = setup
        key = jax.random.key(4)
        cfg = seg_cfg(DefRec_on_trgt=True, debug_aux=True,
                      DefRec_dist="volume_based_radius")
        _, m, _ = seg_steps.pointsegda_train_step(
            state, jnp.asarray(sx), jnp.asarray(sy), jnp.asarray(tx),
            key, cfg,
        )
        assert np.isfinite(float(m["total"]))
        # the DefRec_on_trgt branch deforms with keys[4] of the 12-way split
        keys = jax.random.split(key, 12)
        want_dx, want_mask = T.collapse_to_point_batch(
            keys[4], jnp.asarray(m["aux_trgt"]))
        np.testing.assert_array_equal(np.asarray(m["aux_dmask"]),
                                      np.asarray(want_mask))
        np.testing.assert_allclose(np.asarray(m["aux_dx"]),
                                   np.asarray(want_dx), atol=1e-6)

    def test_trainer_loop(self, tmp_path):
        from mlsp_tpu.train import train_pointsegda

        cfg = seg_cfg(out_path=str(tmp_path), epochs=2, DefRec_on_trgt=True,
                      test_batch_size=8, num_points=256)
        # shrink: synthetic seg makes 48 train examples; batch 4 -> 12 steps
        state, results = train_pointsegda(cfg)
        assert 0.0 <= results["test"]["mIoU"] <= 1.0
        assert results["best"]["epoch"] >= 0

    def test_trainer_loop_hengshuang(self, tmp_path):
        """The seg trainer drives the hengshuang_seg backbone end-to-end."""
        from mlsp_tpu.train import train_pointsegda

        cfg = seg_cfg(out_path=str(tmp_path), exp_name="hseg", epochs=1,
                      model="hengshuang_seg", DefRec_on_trgt=True,
                      test_batch_size=8, num_points=64, scan_steps=4)
        state, results = train_pointsegda(cfg)
        assert 0.0 <= results["test"]["mIoU"] <= 1.0


class TestSPST:
    def test_spst_loop(self, tmp_path):
        from mlsp_tpu.train import train_spst

        cfg = SPSTConfig(
            synthetic=True, out_path=str(tmp_path), exp_name="spst",
            batch_size=8, num_points=64, epochs=1, rounds=1,
            threshold=10.0,  # accept everything (entropy < 10)
            model="pointnet", model_file="",
            test_batch_size=8,
        )
        state, results = train_spst(cfg)
        assert "final" in results
        assert (tmp_path / "spst" / "finetune_convergence.json").exists()

    def test_spst_improves_target_accuracy(self, tmp_path):
        """Efficacy, not just plumbing: starting from a briefly source-
        pretrained model, SPST pseudo-label fine-tuning must lift target
        test accuracy over the initial (the reference tracks exactly this,
        `train_spst.py:524-539`)."""
        from mlsp_tpu.train import train_pointda, train_spst
        from mlsp_tpu.utils.config import PointDAConfig

        common = dict(
            synthetic=True, out_path=str(tmp_path),
            src_dataset="modelnet", trgt_dataset="scannet",
            batch_size=16, num_points=64, test_batch_size=16, scan_steps=8,
            model="pointnet", seed=1,
        )
        pre_cfg = PointDAConfig(exp_name="pre", epochs=4, apply_PCM=False,
                                **common)
        pre_state, _ = train_pointda(pre_cfg)

        cfg = SPSTConfig(
            exp_name="spst_ab", epochs=2, rounds=2, model_file="",
            threshold=10.0,  # generous entropy gate: select broadly
            **common,
        )
        _, results = train_spst(cfg, initial_state=pre_state)
        assert results["final"]["acc"] > results["initial"]["acc"], (
            f"SPST did not improve target accuracy: "
            f"{results['initial']['acc']:.4f} -> {results['final']['acc']:.4f}"
        )

    def test_degenerate_round_advances_weight_decay(self, tmp_path):
        """Selection smaller than one drop_last batch: the reference's
        epoch loop would decay spl/cls and step the scheduler, then
        crash on the 0-count division (`train_spst.py:493-505`). We
        survive, skip the train steps, and advance the full per-epoch
        weight decay for the round (PARITY.md: SPST degenerate rounds).
        Covers both selection==0 (threshold 0 under entropy) and
        0 < selection < batch_size (batch bigger than the selected set).
        """
        from mlsp_tpu.train import train_spst

        common = dict(
            synthetic=True, out_path=str(tmp_path),
            num_points=64, epochs=3, rounds=2,
            model="pointnet", model_file="", test_batch_size=8,
        )
        # entropy threshold 0 -> nothing ever selected -> every round
        # degenerate; no crash, decay advanced for rounds*epochs epochs
        cfg = SPSTConfig(exp_name="deg0", batch_size=8,
                         threshold=0.0, **common)
        _, results = train_spst(cfg)
        want = cfg.spl_weight - cfg.weight_decay_per_epoch * 6
        assert results["spl_weight"] == pytest.approx(want)
        assert results["cls_weight"] == pytest.approx(
            cfg.cls_weight - cfg.weight_decay_per_epoch * 6)
        # nothing trained: best never updated
        assert results["best"]["epoch"] == -1

        # nonzero-but-short selection (threshold 10 selects all 256
        # synthetic target train clouds, < batch_size 512) is equally
        # degenerate
        cfg = SPSTConfig(exp_name="deg_small", batch_size=512,
                         threshold=10.0, **common)
        _, results = train_spst(cfg)
        assert results["spl_weight"] == pytest.approx(want)
        assert results["best"]["epoch"] == -1

    def test_selection_thresholds(self):
        """Entropy gate keeps only confident samples."""
        from mlsp_tpu.train.spst import select_pseudo_labels
        from mlsp_tpu.models import PointNet
        from mlsp_tpu.utils.logging import IOStream
        import tempfile

        data, label = synthetic.make_classification(16, 64, seed=3)
        model = PointNet(num_classes=10)
        state = create_train_state(
            model, jax.random.key(0), jnp.zeros((8, 64, 3), jnp.float32),
            heads=("defrec",),
        )
        with tempfile.TemporaryDirectory() as d:
            io = IOStream(d, "t")
            # threshold 0 -> nothing selected (entropy always > 0)
            pcs, pl = select_pseudo_labels(
                state, data, label, np.arange(16), 8, 0.0, True, io, 0)
            assert len(pcs) == 0
            # huge threshold -> everything selected
            pcs, pl = select_pseudo_labels(
                state, data, label, np.arange(16), 8, 100.0, True, io, 0)
            assert len(pcs) == 16
            # max-prob variant
            pcs, pl = select_pseudo_labels(
                state, data, label, np.arange(16), 8, 0.0, False, io, 0)
            assert len(pcs) == 16


class TestUntrainedHeadFreeze:
    def test_ssl_heads_frozen_in_finetune(self):
        """torch-parity: the SPST fine-tune loss never touches the SSL
        heads, so torch's optimizer sees grad None and skips them — the
        loaded head params stay byte-identical across fine-tuning
        (`train_spst.py:472-498`).  Our decay mask must reproduce that
        (an unmasked `add_decayed_weights` would shrink them every
        step), WITHOUT changing the opt_state tree (checkpoint
        structure compatibility)."""
        from mlsp_tpu.models import make_model
        from mlsp_tpu.train.spst import spst_train_step
        from mlsp_tpu.utils.config import SPSTConfig

        cfg = SPSTConfig(synthetic=True, batch_size=B, num_points=N,
                         model="dgcnn")
        model = make_model("dgcnn", 10, k=8)
        sample = jnp.zeros((B, N, 3), jnp.float32)
        heads = ("defrec", "normal", "scan", "density")
        kwargs = dict(optimizer=cfg.optimizer, lr=cfg.lr, wd=cfg.wd,
                      momentum=cfg.momentum, heads=heads, epoch_lr=True)
        state = create_train_state(model, jax.random.key(0), sample,
                                   untrained_heads=heads, **kwargs)
        unmasked = create_train_state(model, jax.random.key(0), sample,
                                      **kwargs)
        assert (jax.tree_util.tree_structure(state.opt_state)
                == jax.tree_util.tree_structure(unmasked.opt_state))

        rng = np.random.default_rng(3)
        t_x = jnp.asarray(rng.normal(size=(B, N, 3)), jnp.float32)
        s_x = jnp.asarray(rng.normal(size=(B, N, 3)), jnp.float32)
        t_y = jnp.asarray(rng.integers(0, 10, B))
        s_y = jnp.asarray(rng.integers(0, 10, B))
        head_mods = ("DefRec", "NormPred", "RecScan", "DensityCls")
        before = {m: jax.tree_util.tree_map(np.asarray, state.params[m])
                  for m in head_mods}
        for i in range(3):
            state, _ = spst_train_step(state, t_x, t_y, s_x, s_y, 1.0, 1.0,
                                       jax.random.key(i), cfg)
            unmasked, _ = spst_train_step(unmasked, t_x, t_y, s_x, s_y, 1.0,
                                          1.0, jax.random.key(i), cfg)
        for m in head_mods:
            jax.tree_util.tree_map(
                lambda a, b: np.testing.assert_array_equal(a, np.asarray(b)),
                before[m], state.params[m])
        # the old behaviour really did move them (decay), and the trained
        # modules are bit-identical either way
        deltas = [np.abs(np.asarray(a) - b).max()
                  for m in head_mods
                  for a, b in zip(jax.tree_util.tree_leaves(unmasked.params[m]),
                                  jax.tree_util.tree_leaves(before[m]))]
        assert max(deltas) > 0
        for m in state.params:
            if m in head_mods:
                continue
            jax.tree_util.tree_map(
                lambda a, b: np.testing.assert_array_equal(
                    np.asarray(a), np.asarray(b)),
                state.params[m], unmasked.params[m])


class TestCLI:
    def test_cli_help_and_tiny_run(self, tmp_path, capsys):
        from mlsp_tpu.cli import main

        with pytest.raises(SystemExit):
            main(["--help"])
        rc = main([
            "trainer", "--synthetic", "1", "--epochs", "1",
            "--batch_size", "8", "--num_points", "64", "--model", "pointnet",
            "--apply_PCM", "0", "--out_path", str(tmp_path),
            "--exp_name", "cli_t", "--test_batch_size", "8",
        ])
        assert rc == 0
        assert (tmp_path / "cli_t" / "run.log").exists()
