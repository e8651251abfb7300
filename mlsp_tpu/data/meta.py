"""Generic padded npy dataset (the reference's meta dataloader path).

Port of `PaddingData` (`PointDA/data/meta_dataloader.py:18-95`): loads a
flat list of .npy clouds, zero-pads each to a fixed size, and splits
train/val 10/12-2/12. The reference used it for ModelNet40 /
ScanObjectNN transformer pretraining (cf. `PointDA/config/
dataset_configs/*.yaml`); no in-repo caller, provided for API parity.
"""

from __future__ import annotations

import glob
import os

import numpy as np

from mlsp_tpu.data.pipeline import Dataset


def load_padded_npy(
    root: str,
    pattern: str = "*.npy",
    num_points: int = 1024,
    labels_from_parent: bool = True,
    label_map: dict[str, int] | None = None,
) -> Dataset:
    """Load `<root>/<class>/<pattern>` (or flat) into a zero-padded
    fixed-shape Dataset with the 10/12 split of the reference."""
    files = sorted(glob.glob(os.path.join(root, "*", pattern))) or sorted(
        glob.glob(os.path.join(root, pattern))
    )
    if not files:
        raise FileNotFoundError(f"no npy files under {root}")

    clouds = np.zeros((len(files), num_points, 3), np.float32)
    labels = np.zeros((len(files),), np.int64)
    names = sorted({f.split(os.sep)[-2] for f in files}) if labels_from_parent else []
    lmap = label_map or {n: i for i, n in enumerate(names)}
    for i, f in enumerate(files):
        pc = np.load(f).astype(np.float32)[:, :3]
        n = min(len(pc), num_points)
        clouds[i, :n] = pc[:n]  # zero-padding beyond n (meta_dataloader.py:62-66)
        if labels_from_parent:
            labels[i] = lmap.get(f.split(os.sep)[-2], 0)

    m = len(files)
    train = np.asarray([i for i in range(m) if i % 12 < 10])
    val = np.asarray([i for i in range(m) if i % 12 >= 10])
    return Dataset(clouds, labels, train_ind=train, val_ind=val)
