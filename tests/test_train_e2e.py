"""End-to-end training smoke tests on synthetic data (CPU, tiny shapes)."""

import dataclasses
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mlsp_tpu.data import synthetic
from mlsp_tpu.models import DGCNN, PointNet
from mlsp_tpu.train import create_train_state, steps
from mlsp_tpu.utils.config import PointDAConfig

pytestmark = pytest.mark.e2e  # full trainer loops, multi-minute

B, N = 8, 64


def tiny_cfg(**kw):
    base = dict(
        batch_size=B, num_points=N, epochs=3, synthetic=True,
        num_class=10, radius=0.3,
    )
    base.update(kw)
    return PointDAConfig(**base)


@pytest.fixture(scope="module")
def data():
    sx, sy = synthetic.make_classification(B * 4, N, seed=1)
    tx, _ = synthetic.make_classification(B * 4, N, seed=2, noise=0.05)
    return sx, sy, tx


def make_state(model, heads, spe=4, epochs=3):
    sample = jnp.zeros((B, N, 3), jnp.float32)
    return create_train_state(
        model, jax.random.key(0), sample, epochs=epochs,
        steps_per_epoch=spe, heads=heads,
    )


class TestPointDAStep:
    def test_source_only_loss_decreases(self, data):
        sx, sy, tx = data
        cfg = tiny_cfg(apply_PCM=False, model="dgcnn")
        model = DGCNN(num_classes=10, k=8)
        state = make_state(model, ())
        key = jax.random.key(0)
        first = last = None
        for step_i in range(8):
            i = (step_i % 4) * B
            key, k = jax.random.split(key)
            state, m = steps.pointda_train_step(
                state, jnp.asarray(sx[i:i+B]), jnp.asarray(sy[i:i+B]),
                jnp.asarray(tx[i:i+B]), k, cfg,
            )
            if first is None:
                first = float(m["total"])
            last = float(m["total"])
        assert np.isfinite(last)
        assert last < first  # learning happened

    def test_full_recipe_runs(self, data):
        sx, sy, tx = data
        cfg = tiny_cfg(
            model="dgcnn",
            Density_normal_viainput=True, Normal_ondef=True, Density_ondef=True,
        )
        model = DGCNN(num_classes=10, k=8)
        state = make_state(model, ("defrec", "normal", "scan", "density"))
        state, m = steps.pointda_train_step(
            state, jnp.asarray(sx[:B]), jnp.asarray(sy[:B]),
            jnp.asarray(tx[:B]), jax.random.key(1), cfg,
        )
        for name in ("src_mixup", "trgt_DefRec", "trgt_def_normal",
                     "trgt_def_density_cls", "trgt_def_density_mse", "total"):
            assert name in m, name
            assert np.isfinite(float(m[name])), name
        # normal cos-loss in [-w, 0]
        assert -0.5 <= float(m["trgt_def_normal"]) <= 0.0

    def test_chamfer_transport_variant(self, data):
        sx, sy, tx = data
        cfg = tiny_cfg(
            model="dgcnn",
            Density_normal_viachamfer=True, Normal_ondef=True, Density_ondef=True,
        )
        model = DGCNN(num_classes=10, k=8)
        state = make_state(model, ("defrec", "normal", "density"))
        state, m = steps.pointda_train_step(
            state, jnp.asarray(sx[:B]), jnp.asarray(sy[:B]),
            jnp.asarray(tx[:B]), jax.random.key(1), cfg,
        )
        assert np.isfinite(float(m["total"]))
        assert "trgt_def_normal" in m

    def test_all_aux_branches(self, data):
        sx, sy, tx = data
        cfg = tiny_cfg(
            model="dgcnn", DefRec_on_src=True, DefRec_on_trgt=True,
            Norm_on_trgt=True, Scan_on_trgt=True, Density_on_trgt=True,
        )
        model = DGCNN(num_classes=10, k=8)
        state = make_state(model, ("defrec", "normal", "scan", "density"))
        state, m = steps.pointda_train_step(
            state, jnp.asarray(sx[:B]), jnp.asarray(sy[:B]),
            jnp.asarray(tx[:B]), jax.random.key(2), cfg,
        )
        for name in ("src_DefRec", "trgt_DefRec", "trgt_Normal",
                     "trgt_Rec_scan", "trgt_Density_cls"):
            assert np.isfinite(float(m[name])), name

    def test_pointnet_variant(self, data):
        sx, sy, tx = data
        cfg = tiny_cfg(model="pointnet", DefRec_on_trgt=True)
        model = PointNet(num_classes=10)
        state = make_state(model, ("defrec",))
        state, m = steps.pointda_train_step(
            state, jnp.asarray(sx[:B]), jnp.asarray(sy[:B]),
            jnp.asarray(tx[:B]), jax.random.key(3), cfg,
        )
        assert np.isfinite(float(m["total"]))


class TestDefRecDist:
    """`--DefRec_dist volume_based_radius` must actually change the
    deformation (`MLSP/mlsp.py:33-35` honors it at every deform site)."""

    def test_radius_dispatch_reaches_pointda_step(self, data):
        from mlsp_tpu import transforms as T

        sx, sy, tx = data
        key = jax.random.key(5)
        deformed = {}
        for dist in ("volume_based_voxels", "volume_based_radius"):
            cfg = tiny_cfg(
                model="dgcnn", DefRec_dist=dist, debug_aux=True,
                Density_normal_viainput=True, Normal_ondef=True,
                Density_ondef=True,
            )
            model = DGCNN(num_classes=10, k=8)
            state = make_state(model, ("defrec", "normal", "scan", "density"))
            _, m = steps.pointda_train_step(
                state, jnp.asarray(sx[:B]), jnp.asarray(sy[:B]),
                jnp.asarray(tx[:B]), key, cfg,
            )
            deformed[dist] = (np.asarray(m["aux_dx"]),
                              np.asarray(m["aux_dmask"]),
                              np.asarray(m["aux_trgt"]))
            assert np.isfinite(float(m["total"]))

        # the flag changed the deformation
        assert not np.array_equal(deformed["volume_based_radius"][0],
                                  deformed["volume_based_voxels"][0])
        # and the radius branch consumed the radius transform: the step's
        # viainput deform uses keys[14] of its 17-way split
        keys = jax.random.split(key, 17)
        dx, dmask, trgt_a = deformed["volume_based_radius"]
        want_dx, want_mask = T.collapse_to_point_batch(
            keys[14], jnp.asarray(trgt_a))
        np.testing.assert_array_equal(dmask, np.asarray(want_mask))
        np.testing.assert_allclose(dx, np.asarray(want_dx), atol=1e-6)

    def test_radius_variant_trains(self, data):
        sx, sy, tx = data
        cfg = tiny_cfg(
            model="dgcnn", DefRec_dist="volume_based_radius",
            DefRec_on_trgt=True, Density_normal_viainput=True,
            Normal_ondef=True, Density_ondef=True,
        )
        model = DGCNN(num_classes=10, k=8)
        state = make_state(model, ("defrec", "normal", "scan", "density"))
        key = jax.random.key(6)
        p0 = jax.tree_util.tree_leaves(state.params)[0].copy()
        for i in range(3):
            key, k = jax.random.split(key)
            j = (i % 4) * B
            state, m = steps.pointda_train_step(
                state, jnp.asarray(sx[j:j+B]), jnp.asarray(sy[j:j+B]),
                jnp.asarray(tx[j:j+B]), k, cfg,
            )
            assert np.isfinite(float(m["total"]))
            assert float(m["trgt_DefRec"]) > 0
        assert not np.array_equal(p0, jax.tree_util.tree_leaves(state.params)[0])


class TestPCM:
    def test_mix_shapes(self, data):
        sx, sy, _ = data
        mixed, (ya, yb, lam) = steps.pcm_mix(
            jax.random.key(0), jnp.asarray(sx[:B]), jnp.asarray(sy[:B]), 1.0
        )
        assert mixed.shape == (B, N, 3)
        assert 0.0 <= float(lam) <= 1.0
        # Every mixed point exists in one of the two parent clouds.
        mixed0 = np.asarray(mixed[0])
        parents = np.concatenate([sx[:B].reshape(-1, 3)])
        d = ((mixed0[:, None] - parents[None]) ** 2).sum(-1).min(1)
        assert d.max() < 1e-8

    def test_mix_segmentation_labels_follow_points(self, data):
        rng = np.random.default_rng(0)
        x = rng.standard_normal((4, 32, 3)).astype(np.float32)
        # label = sign bucket of x coordinate — transported labels must
        # stay consistent with their points
        y = (x[..., 0] > 0).astype(np.int64)
        mixed, my = steps.pcm_mix_segmentation(
            jax.random.key(1), jnp.asarray(x), jnp.asarray(y), 1.0
        )
        mixed, my = np.asarray(mixed), np.asarray(my)
        np.testing.assert_array_equal((mixed[..., 0] > 0).astype(np.int64), my)


class TestTrainerLoop:
    def test_train_pointda_synthetic(self, tmp_path):
        from mlsp_tpu.train import train_pointda

        cfg = PointDAConfig(
            synthetic=True, epochs=2, batch_size=8, num_points=64,
            out_path=str(tmp_path), exp_name="t", model="pointnet",
            apply_PCM=False, test_batch_size=8, save_every=1,
        )
        state, results = train_pointda(cfg)
        assert results["test"]["acc"] >= 0.0
        assert (tmp_path / "t" / "model.ckpt").exists()
        assert (tmp_path / "t" / "run.log").exists()
        # reference-parity epoch-end prints (trainer.py:598-611)
        log = (tmp_path / "t" / "run.log").read_text()
        assert "Best validation model confusion matrix:" in log
        assert "Test confusion matrix:" in log
        # periodic checkpoint (save_every=1): written every epoch and
        # resumable — a resume from it continues at epoch 2 == done.
        from mlsp_tpu.utils import checkpoint

        _, last_epoch, _ = checkpoint.load_train_state(
            str(tmp_path / "t" / "last.ckpt"), state)
        assert last_epoch == 1
        # machine-readable per-epoch metrics (IOStream.log_metrics)
        import json

        lines = (tmp_path / "t" / "metrics.jsonl").read_text().splitlines()
        assert len(lines) == 2
        rec = json.loads(lines[-1])
        assert rec["epoch"] == 1
        assert {"train", "src_val", "trgt_val"} <= set(rec)
        assert isinstance(rec["src_val"]["acc"], float)


_PREEMPT_DRIVER = r"""
import sys
import jax
jax.config.update("jax_platforms", "cpu")
from mlsp_tpu.utils.cache import enable
enable()
from mlsp_tpu.parallel import make_mesh
from mlsp_tpu.train import train_pointda
from mlsp_tpu.utils.config import PointDAConfig

out, name, resume = sys.argv[1], sys.argv[2], sys.argv[3]
cfg = PointDAConfig(
    synthetic=True, epochs=3, batch_size=8, num_points=64,
    out_path=out, exp_name=name, model="pointnet", apply_PCM=False,
    test_batch_size=8, save_every=1, scan_steps=4,
    resume="" if resume == "-" else resume,
)
train_pointda(cfg, mesh=make_mesh(data=2))
print("DONE", flush=True)
"""


class TestPreemptionDrill:
    """SIGKILL a mesh trainer mid-epoch, `--resume` from the periodic
    checkpoint, and the trajectory must MATCH an uninterrupted run —
    possible because each epoch's shuffle/PRNG streams derive from
    (seed, epoch), not from sequential consumption (SURVEY §5: the
    reference has neither periodic checkpoints nor resume)."""

    @pytest.mark.slow
    def test_kill_resume_matches_uninterrupted(self, tmp_path):
        import subprocess
        import sys as _sys
        import time

        from flax import serialization

        env = dict(os.environ)
        env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
        env.pop("JAX_PLATFORMS", None)
        env["PYTHONPATH"] = (
            os.path.dirname(os.path.dirname(__file__))
            + os.pathsep + env.get("PYTHONPATH", ""))
        driver = tmp_path / "driver.py"
        driver.write_text(_PREEMPT_DRIVER)

        def run(name, resume="-"):
            return subprocess.run(
                [_sys.executable, str(driver), str(tmp_path), name, resume],
                env=env, capture_output=True, text=True, timeout=900)

        # (a) uninterrupted 3-epoch run under a data=2 mesh
        ra = run("full")
        assert ra.returncode == 0 and "DONE" in ra.stdout, ra.stdout + ra.stderr

        # (b) same run, SIGKILLed mid-training after epoch 0 completes
        pb = subprocess.Popen(
            [_sys.executable, str(driver), str(tmp_path), "pre", "-"],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True)
        metrics = tmp_path / "pre" / "metrics.jsonl"
        deadline = time.time() + 600
        while time.time() < deadline:
            if metrics.exists() and len(metrics.read_text().splitlines()) >= 1:
                break
            if pb.poll() is not None:
                raise AssertionError("trainer exited early:\n" +
                                     pb.communicate()[0])
            time.sleep(1.0)
        else:
            raise AssertionError("epoch 0 never completed")
        time.sleep(2.0)  # land INSIDE a later epoch
        pb.kill()
        pb.communicate()
        last = tmp_path / "pre" / "last.ckpt"
        assert last.exists(), "periodic checkpoint missing after kill"

        # (c) resume from the periodic checkpoint to completion
        rc = run("pre", str(last))
        assert rc.returncode == 0 and "DONE" in rc.stdout, rc.stdout + rc.stderr
        assert "resumed from" in (tmp_path / "pre" / "run.log").read_text()

        # identical final state: params + batch stats + optimizer
        def load(name):
            return serialization.msgpack_restore(
                (tmp_path / name / "last.ckpt").read_bytes())

        a, c = load("full"), load("pre")
        assert a["epoch"] == c["epoch"] == 2
        jax.tree_util.tree_map(
            lambda x, y: np.testing.assert_allclose(
                np.asarray(x), np.asarray(y), rtol=1e-5, atol=1e-7),
            {"params": a["params"], "batch_stats": a["batch_stats"],
             "opt_state": a["opt_state"]},
            {"params": c["params"], "batch_stats": c["batch_stats"],
             "opt_state": c["opt_state"]})
        # and the per-epoch metric records line up
        la = (tmp_path / "full" / "metrics.jsonl").read_text().splitlines()
        lc = (tmp_path / "pre" / "metrics.jsonl").read_text().splitlines()
        assert len(la) == len(lc) == 3


class TestSPL:
    def test_inline_pseudo_labels(self, data):
        sx, sy, tx = data
        from mlsp_tpu.models import DGCNN

        model = DGCNN(num_classes=10, k=8)
        for kw, name in (
            (dict(apply_SPL_v2=True, gamma_v2=100.0), "entropy-all"),
            (dict(apply_SPL=True, gamma=0.0), "conf-all"),
            (dict(apply_SPL_v2=True, gamma_v2=0.0), "entropy-none"),
        ):
            cfg = tiny_cfg(model="dgcnn", **kw)
            state = make_state(model, ())
            state, m = steps.pointda_train_step(
                state, jnp.asarray(sx[:B]), jnp.asarray(sy[:B]),
                jnp.asarray(tx[:B]), jax.random.key(4), cfg,
            )
            assert np.isfinite(float(m["total"])), name
            assert "trgt_SPL" in m
            sel = float(m["trgt_SPL_selected"])
            if name.endswith("-all"):
                assert sel == 1.0
            else:
                assert sel == 0.0 and float(m["trgt_SPL"]) == 0.0


class TestOnSrcRecipe:
    def test_density_normal_viainput_onsrc(self, data):
        sx, sy, tx = data
        cfg = tiny_cfg(
            model="dgcnn", Density_normal_viainput_onsrc=True,
            Normal_ondef=True, Density_ondef=True,
        )
        model = DGCNN(num_classes=10, k=8)
        state = make_state(model, ("defrec", "normal", "scan", "density"))
        state, m = steps.pointda_train_step(
            state, jnp.asarray(sx[:B]), jnp.asarray(sy[:B]),
            jnp.asarray(tx[:B]), jax.random.key(5), cfg,
        )
        for name in ("src_DefRec", "src_def_normal", "src_def_density_cls"):
            assert name in m and np.isfinite(float(m[name])), name


class TestFailureGuard:
    def test_nonfinite_loss_aborts_with_crash_state(self, tmp_path):
        """SURVEY §5 failure detection: a NaN epoch loss aborts the run,
        names the offending terms, and saves a post-mortem checkpoint."""
        import jax
        import jax.numpy as jnp
        import pytest

        from mlsp_tpu.models import PointNet
        from mlsp_tpu.train.guard import check_finite_losses
        from mlsp_tpu.train.state import create_train_state
        from mlsp_tpu.utils import checkpoint
        from mlsp_tpu.utils.logging import IOStream

        io = IOStream(str(tmp_path), "g")
        state = create_train_state(
            PointNet(num_classes=10), jax.random.key(0),
            jnp.zeros((2, 32, 3), jnp.float32), heads=("defrec",))

        check_finite_losses({"total": 1.0, "src_cls": 0.5}, state, 0, io)  # ok

        with pytest.raises(FloatingPointError, match="defrec.*total"):
            check_finite_losses(
                {"total": float("nan"), "src_cls": 0.5,
                 "defrec": float("inf")}, state, 3, io)
        crash = tmp_path / "g" / "nonfinite_crash.ckpt"
        assert crash.exists()
        _, epoch, metrics = checkpoint.load_train_state(str(crash), state)
        assert epoch == 3
        assert metrics["nonfinite_terms"] == "defrec,total"
        assert "non-finite loss at epoch 3" in (tmp_path / "g" / "run.log").read_text()
