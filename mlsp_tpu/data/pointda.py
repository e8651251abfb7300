"""PointDA-10 datasets: ModelNet / ShapeNet (.npy trees) and ScanNet (.h5).

Port of `PointDA/data/dataloader.py` with the per-sample CPU work moved
into a one-time device-batched preprocessing pass
(:func:`mlsp_tpu.data.pipeline.standardize_clouds`). Falls back to the
synthetic generator when the data root is missing and `synthetic=True`.
"""

from __future__ import annotations

import glob
import os

import numpy as np

from mlsp_tpu.data import synthetic
from mlsp_tpu.data.pipeline import Dataset, standardize_clouds, standardize_files

NUM_POINTS = 1024  # PointDA/data/dataloader.py:11
label_to_idx = {
    "bathtub": 0, "bed": 1, "bookshelf": 2, "cabinet": 3, "chair": 4,
    "lamp": 5, "monitor": 6, "plant": 7, "sofa": 8, "table": 9,
}
idx_to_label = {v: k for k, v in label_to_idx.items()}


def _npy_tree_files(dataroot: str, name: str, partition: str):
    root = os.path.join(dataroot, "PointDA_data", name)
    files = sorted(glob.glob(os.path.join(root, "*", partition, "*.npy")))
    if not files:
        raise FileNotFoundError(f"no {name} npy files under {root}")
    labels = np.asarray([label_to_idx[f.split(os.sep)[-3]] for f in files], np.int64)
    return files, labels


def _load_scannet_h5(dataroot: str, partition: str):
    root = os.path.join(dataroot, "PointDA_data", "scannet")
    files = sorted(glob.glob(os.path.join(root, f"{partition}_*.h5")))
    if not files:
        raise FileNotFoundError(f"no scannet h5 files under {root}")
    import h5py

    datas, labels = [], []
    for fn in files:
        with h5py.File(fn, "r") as f:
            datas.append(f["data"][:])
            labels.append(f["label"][:])
    return (
        list(np.concatenate(datas, 0).astype(np.float32)),
        np.concatenate(labels, 0).astype(np.int64).reshape(-1),
    )


def load_pointda(
    name: str,
    dataroot: str,
    partition: str = "train",
    num_points: int = NUM_POINTS,
    synthetic_fallback: bool = False,
    seed: int = 1,
) -> Dataset:
    """Load one PointDA domain as a fixed-shape Dataset.

    Alignment rotations match `dataloader.py:101-103,206-209`: ScanNet
    always -pi/2 about x, ShapeNet -pi/2 about x except class "plant",
    ModelNet none.
    """
    try:
        files = None
        if name == "scannet":
            clouds, labels = _load_scannet_h5(dataroot, partition)
            rot_axis, rot_mask = "x", None
        elif name in ("modelnet", "shapenet"):
            files, labels = _npy_tree_files(dataroot, name, partition)
            rot_axis = "x" if name == "shapenet" else None
            rot_mask = (
                labels != label_to_idx["plant"] if name == "shapenet" else None
            )
        else:
            raise ValueError(f"unknown PointDA domain {name!r}")
    except FileNotFoundError:
        if not synthetic_fallback:
            raise
        # Domain-shifted synthetic stand-ins: each domain gets its own
        # noise level/seed so source->target transfer is non-trivial.
        dom_seed = {"modelnet": 10, "shapenet": 20, "scannet": 30}[name]
        noise = {"modelnet": 0.01, "shapenet": 0.02, "scannet": 0.05}[name]
        n_ex = 320 if partition == "train" else 80
        data, labels = synthetic.make_classification(
            n_ex, num_points, seed=dom_seed + (0 if partition == "train" else 1),
            noise=noise,
        )
        ds = Dataset(data, labels)
        return ds.split(seed) if partition == "train" else ds

    if files is not None:
        # npy trees ingest straight from disk (native C++ thread pool
        # when available; numpy fallback inside).
        data = standardize_files(
            files, num_points, rotate_axis=rot_axis, rotate_angle=-np.pi / 2,
            rotate_mask=rot_mask,
        )
    else:
        data = standardize_clouds(
            clouds, num_points, rotate_axis=rot_axis, rotate_angle=-np.pi / 2,
            rotate_mask=rot_mask,
        )
    ds = Dataset(data, labels)
    return ds.split(seed) if partition == "train" else ds
