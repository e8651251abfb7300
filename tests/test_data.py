"""Data layer tests against real on-disk formats (fake PointDA trees /
ScanNet h5 / PointSegDA shards) and the preprocessing pipeline."""

import os

import numpy as np
import pytest

from mlsp_tpu.data import load_pointda, load_pointsegda, label_to_idx
from mlsp_tpu.data.pipeline import Dataset, batches, num_batches, standardize_clouds


def _make_pointda_tree(root, name, classes=("chair", "plant"), per_class=3,
                       n_raw=200, rng=None):
    rng = rng or np.random.default_rng(0)
    for cls in classes:
        d = os.path.join(root, "PointDA_data", name, cls, "train")
        os.makedirs(d, exist_ok=True)
        for i in range(per_class):
            np.save(os.path.join(d, f"{cls}_{i:04d}.npy"),
                    rng.standard_normal((n_raw, 3)).astype(np.float32) * 2)


class TestPointDALoaders:
    def test_npy_tree_modelnet(self, tmp_path, rng):
        _make_pointda_tree(str(tmp_path), "modelnet", per_class=6, n_raw=96, rng=rng)
        ds = load_pointda("modelnet", str(tmp_path), "train", num_points=64)
        assert ds.data.shape == (12, 64, 3)
        # unit-cube normalised
        norms = np.linalg.norm(ds.data, axis=-1).max(1)
        np.testing.assert_allclose(norms, 1.0, atol=1e-4)
        # labels from directory names
        assert set(ds.label) == {label_to_idx["chair"], label_to_idx["plant"]}
        # split: i%10<8
        assert len(ds.train_ind) == 10 and len(ds.val_ind) == 2

    def test_shapenet_plant_rotation_exception(self, tmp_path, rng):
        """ShapeNet rotates -pi/2 about x EXCEPT class plant
        (dataloader.py:206-209): a z-heavy chair cloud must change, an
        identical plant cloud must not."""
        base = rng.standard_normal((96, 3)).astype(np.float32)
        for cls in ("chair", "plant"):
            d = os.path.join(tmp_path, "PointDA_data", "shapenet", cls, "train")
            os.makedirs(d)
            np.save(os.path.join(d, "a.npy"), base.copy())
        ds = load_pointda("shapenet", str(tmp_path), "train", num_points=96)
        chair = ds.data[list(ds.label).index(label_to_idx["chair"])]
        plant = ds.data[list(ds.label).index(label_to_idx["plant"])]
        from mlsp_tpu.transforms.augment import scale_to_unit_cube, rotate_shape
        import jax.numpy as jnp

        want_plant = np.asarray(scale_to_unit_cube(jnp.asarray(base)))
        np.testing.assert_allclose(plant, want_plant, atol=1e-5)
        assert np.abs(chair - want_plant).max() > 0.1  # rotated

    def test_scannet_h5(self, tmp_path, rng):
        import h5py

        d = os.path.join(tmp_path, "PointDA_data", "scannet")
        os.makedirs(d)
        for part, m in (("train", 8), ("test", 4)):
            with h5py.File(os.path.join(d, f"{part}_0.h5"), "w") as f:
                f["data"] = rng.standard_normal((m, 128, 6)).astype(np.float32)
                f["label"] = rng.integers(0, 10, (m, 1))
        tr = load_pointda("scannet", str(tmp_path), "train", num_points=64)
        te = load_pointda("scannet", str(tmp_path), "test", num_points=64)
        assert tr.data.shape == (8, 64, 3)  # xyz only, FPS'd down
        assert te.data.shape == (4, 64, 3)
        assert te.train_ind is None  # no split on test

    def test_missing_raises_without_fallback(self, tmp_path):
        with pytest.raises(FileNotFoundError):
            load_pointda("modelnet", str(tmp_path), "train", synthetic_fallback=False)


class TestPointSegDALoader:
    def test_npy_shards(self, tmp_path, rng):
        d = os.path.join(tmp_path, "faust", "train")
        os.makedirs(d)
        for i in range(4):
            pc = rng.standard_normal((128, 4)).astype(np.float32)
            pc[:, 3] = rng.integers(1, 9, 128)  # labels 1..8
            np.save(os.path.join(d, f"{i}.npy"), pc)
        ds = load_pointsegda("faust", str(tmp_path), "train")
        assert ds.data.shape == (4, 128, 3)
        assert ds.label.min() >= 0 and ds.label.max() <= 7  # shifted to 0-7


class TestPreprocessing:
    def test_fps_downsample_exact(self, rng):
        """Clouds above num_points FPS down; duplicate-padding must not
        change the selected point set."""
        from oracles import fps_np

        pc = rng.standard_normal((100, 3)).astype(np.float32)
        out = standardize_clouds([pc], num_points=32)
        from mlsp_tpu.transforms.augment import scale_to_unit_cube
        import jax.numpy as jnp

        scaled = np.asarray(scale_to_unit_cube(jnp.asarray(pc)))
        want = scaled[fps_np(scaled, 32, 0)]
        np.testing.assert_allclose(out[0], want, atol=1e-5)

    def test_small_cloud_repeat_pad(self, rng):
        pc = rng.standard_normal((10, 3)).astype(np.float32)
        out = standardize_clouds([pc], num_points=32)
        assert out.shape == (1, 32, 3)
        # padded points are repeats of real ones
        d = ((out[0][:, None] - out[0][None, :10]) ** 2).sum(-1).min(1)
        assert d.max() < 1e-10

    def test_mixed_sizes(self, rng):
        clouds = [rng.standard_normal((n, 3)).astype(np.float32)
                  for n in (40, 100, 64, 300)]
        out = standardize_clouds(clouds, num_points=64)
        assert out.shape == (4, 64, 3)
        assert np.isfinite(out).all()


class TestBatching:
    def test_drop_last_and_count(self, rng):
        data = rng.standard_normal((10, 8, 3)).astype(np.float32)
        label = np.arange(10)
        got = list(batches(data, label, 4, drop_last=True))
        assert len(got) == 2 and num_batches(10, 4, True) == 2
        got = list(batches(data, label, 4, drop_last=False))
        assert len(got) == 3 and got[-1][0].shape[0] == 2

    def test_shuffle_deterministic(self, rng):
        data = np.arange(20, dtype=np.float32).reshape(20, 1, 1).repeat(3, 2)
        label = np.arange(20)
        a = [y for _, y in batches(data, label, 5, shuffle=True,
                                   rng=np.random.default_rng(7))]
        b = [y for _, y in batches(data, label, 5, shuffle=True,
                                   rng=np.random.default_rng(7))]
        np.testing.assert_array_equal(np.concatenate(a), np.concatenate(b))


class TestDeterminism:
    def test_same_seed_same_training(self, tmp_path):
        from mlsp_tpu.train import train_pointda
        from mlsp_tpu.utils.config import PointDAConfig

        res = []
        for run in range(2):
            cfg = PointDAConfig(
                synthetic=True, epochs=1, batch_size=8, num_points=64,
                out_path=str(tmp_path), exp_name=f"det{run}", model="pointnet",
                apply_PCM=False, test_batch_size=8, seed=3,
            )
            _, r = train_pointda(cfg)
            res.append(r["test"]["acc"])
        assert res[0] == res[1]

    def test_resume_continues(self, tmp_path):
        from mlsp_tpu.train import train_pointda
        from mlsp_tpu.utils.config import PointDAConfig
        import dataclasses

        cfg = PointDAConfig(
            synthetic=True, epochs=1, batch_size=8, num_points=64,
            out_path=str(tmp_path), exp_name="res", model="pointnet",
            apply_PCM=False, test_batch_size=8,
        )
        train_pointda(cfg)
        ckpt = os.path.join(str(tmp_path), "res", "model.ckpt")
        cfg2 = dataclasses.replace(cfg, epochs=2, exp_name="res2", resume=ckpt)
        _, r = train_pointda(cfg2)
        log = open(os.path.join(str(tmp_path), "res2", "run.log")).read()
        assert "resumed from" in log


class TestIndexIntegrity:
    def test_batches_does_not_mutate_indices(self, rng):
        """Regression: shuffle=True must not permute the caller's split."""
        data = rng.standard_normal((12, 4, 3)).astype(np.float32)
        label = np.arange(12)
        ind = np.arange(0, 12, 2)
        before = ind.copy()
        list(batches(data, label, 3, indices=ind, shuffle=True,
                     rng=np.random.default_rng(0)))
        np.testing.assert_array_equal(ind, before)
