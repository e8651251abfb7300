"""PointSegDA datasets: adobe/faust/mit/scape .npy shards of [N, 4]
(xyz + 1-based part label), cf. `PointSegDA/data/dataloader.py:7-30`."""

from __future__ import annotations

import glob
import os

import numpy as np

from mlsp_tpu.data import synthetic
from mlsp_tpu.data.pipeline import Dataset

NUM_POINTS = 2048
NUM_CLASSES = 8


def load_pointsegda(
    name: str,
    dataroot: str,
    partition: str = "train",
    synthetic_fallback: bool = False,
    num_points: int = NUM_POINTS,
) -> Dataset:
    """`num_points` sizes the synthetic fallback only; real PointSegDA
    shards are fixed 2048-point clouds."""
    files = sorted(glob.glob(os.path.join(dataroot, name, partition, "*.npy")))
    if not files:
        if not synthetic_fallback:
            raise FileNotFoundError(
                f"no PointSegDA npy files under {dataroot}/{name}/{partition}"
            )
        dom_seed = {"adobe": 40, "faust": 50, "mit": 60, "scape": 70}[name]
        n_ex = {"train": 48, "val": 16, "test": 16}[partition]
        data, labels = synthetic.make_segmentation(
            n_ex, num_points, NUM_CLASSES,
            seed=dom_seed + {"train": 0, "val": 1, "test": 2}[partition],
        )
        return Dataset(data, labels)

    raw = [np.load(f) for f in files]
    data = np.stack([r[:, :3].astype(np.float32) for r in raw])
    labels = np.stack([r[:, 3].astype(np.int64) - 1 for r in raw])  # 1-8 -> 0-7
    return Dataset(data, labels)
