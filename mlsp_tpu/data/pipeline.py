"""In-memory dataset container + batching.

Replaces torch Dataset/DataLoader/SubsetRandomSampler
(`PointDA/trainer.py:193-236`). Decoded clouds live as one contiguous
numpy array; preprocessing (unit-cube, alignment rotation, FPS to fixed
N) happens once up front in device-batched passes; per-epoch train
augmentation (z-rotation + jitter) runs *inside* the jitted train step.
That removes the reference's hot CPU path (numpy FPS per __getitem__,
4 worker processes) entirely.
"""

from __future__ import annotations

import dataclasses
from collections.abc import Iterator

import jax
import numpy as np

from mlsp_tpu.ops.fps import fps, fps_gather


@dataclasses.dataclass
class Dataset:
    """Fixed-shape in-memory dataset.

    data: [M, N, 3] float32; label: [M] (cls) or [M, N] (seg) int;
    train_ind/val_ind: reference-compatible 8/10-2/10 split indices
    (`PointDA/data/dataloader.py:70-73`)."""

    data: np.ndarray
    label: np.ndarray
    train_ind: np.ndarray | None = None
    val_ind: np.ndarray | None = None

    def __len__(self) -> int:
        return self.data.shape[0]

    def split(self, seed: int = 1) -> "Dataset":
        m = len(self)
        rng = np.random.default_rng(seed)
        train = np.asarray([i for i in range(m) if i % 10 < 8])
        val = np.asarray([i for i in range(m) if i % 10 >= 8])
        rng.shuffle(train)
        rng.shuffle(val)
        return dataclasses.replace(self, train_ind=train, val_ind=val)


def batches(
    data: np.ndarray,
    label: np.ndarray,
    batch_size: int,
    *,
    indices: np.ndarray | None = None,
    shuffle: bool = False,
    drop_last: bool = False,
    rng: np.random.Generator | None = None,
) -> Iterator[tuple[np.ndarray, np.ndarray]]:
    """Yield (clouds, labels) numpy batches; device transfer is the
    caller's (jit's) job."""
    # Copy: shuffling must never mutate the caller's split arrays.
    idx = np.arange(data.shape[0]) if indices is None else np.array(indices, copy=True)
    if shuffle:
        (rng or np.random.default_rng()).shuffle(idx)
    n = idx.shape[0]
    for s in range(0, n, batch_size):
        sel = idx[s : s + batch_size]
        if drop_last and sel.shape[0] < batch_size:
            return
        yield data[sel], label[sel]


def num_batches(n_examples: int, batch_size: int, drop_last: bool) -> int:
    return n_examples // batch_size if drop_last else -(-n_examples // batch_size)


def pad_batch(x: np.ndarray, y: np.ndarray, size: int):
    """Repetition-pad a trailing partial batch to `size`; returns
    (x, y, valid_count). Shared by every eval/selection loop."""
    n = x.shape[0]
    if n == size:
        return x, y, n
    reps = -(-size // n)
    return (np.concatenate([x] * reps)[:size],
            np.concatenate([y] * reps)[:size], n)


# ---------------------------------------------------------------------------
# Preprocessing: variable-size raw clouds -> fixed [M, num_points, 3]
# ---------------------------------------------------------------------------

_PAD_CHUNK = 64


def _fps_chunk(chunk: np.ndarray, num_points: int) -> np.ndarray:
    """Device FPS on a padded [C, P, 3] chunk -> [C, num_points, 3]."""
    x = jax.numpy.asarray(chunk)
    start = jax.numpy.zeros((x.shape[0],), jax.numpy.int32)
    idx = fps(x, num_points, start)
    return np.asarray(fps_gather(x, idx))


def standardize_clouds(
    clouds: list[np.ndarray],
    num_points: int,
    rotate_axis: str | None = None,
    rotate_angle: float = 0.0,
    rotate_mask: np.ndarray | None = None,
) -> np.ndarray:
    """Unit-cube scale, optional alignment rotation, FPS/pad to num_points.

    Mirrors the reference __getitem__ pipeline
    (`PointDA/data/dataloader.py:79-95`), executed once instead of per
    epoch. `rotate_mask` selects which clouds get the alignment rotation
    (ShapeNet skips class "plant", dataloader.py:206-209).

    Duplicate-padding before FPS is exact: duplicated points never alter
    farthest-point geometry and ties resolve to the first occurrence.
    """
    # Host-side numpy math: eager per-cloud device ops through the TPU
    # relay cost one RTT each (see CLAUDE.md), so unit-cube scaling and
    # the alignment rotation stay in numpy; only FPS goes to the device,
    # batched.
    def _unit_cube(x):
        x = x - x.mean(0)
        return x / max(float(np.linalg.norm(x, axis=1).max()), 1e-12)

    def _rot(x, axis, angle):
        c, sn = np.cos(angle), np.sin(angle)
        mats = {
            "x": [[1, 0, 0], [0, c, -sn], [0, sn, c]],
            "y": [[c, 0, sn], [0, 1, 0], [-sn, 0, c]],
            "z": [[c, -sn, 0], [sn, c, 0], [0, 0, 1]],
        }
        return x @ np.asarray(mats[axis], np.float32)

    out = np.empty((len(clouds), num_points, 3), np.float32)
    # Group by padded size to bound jit recompiles.
    pads: dict[int, list[int]] = {}
    prepped: list[np.ndarray] = []
    for i, pc in enumerate(clouds):
        pc = np.asarray(pc, np.float32)[:, :3]
        pc = _unit_cube(pc)
        if rotate_axis is not None and (rotate_mask is None or rotate_mask[i]):
            pc = _rot(pc, rotate_axis, rotate_angle)
        if pc.shape[0] <= num_points:
            if pc.shape[0] < num_points:  # repeat-pad small clouds
                reps = -(-num_points // pc.shape[0])
                pc = np.tile(pc, (reps, 1))[:num_points]
            out[i] = pc
            prepped.append(None)
        else:
            prepped.append(pc)
            padded = 1 << (pc.shape[0] - 1).bit_length()  # next pow2 bucket
            pads.setdefault(padded, []).append(i)

    for padded, ids in pads.items():
        for s in range(0, len(ids), _PAD_CHUNK):
            sel = ids[s : s + _PAD_CHUNK]
            chunk = np.empty((len(sel), padded, 3), np.float32)
            for j, i in enumerate(sel):
                pc = prepped[i]
                reps = -(-padded // pc.shape[0])
                chunk[j] = np.tile(pc, (reps, 1))[:padded]
            out[np.asarray(sel)] = _fps_chunk(chunk, num_points)
    return out


def standardize_files(
    files: list[str],
    num_points: int,
    rotate_axis: str | None = None,
    rotate_angle: float = 0.0,
    rotate_mask: np.ndarray | None = None,
    native_ingest: bool | None = None,
) -> np.ndarray:
    """:func:`standardize_clouds` straight from .npy files.

    With the native library available (default: auto-detect; force off
    with native_ingest=False or MLSP_NATIVE_INGEST=0), raw-file ingest —
    npy parse, f32 xyz decode, unit-cube, alignment rotation, tile-pad
    into size buckets — runs in the C++ thread pool
    (`native/mlsp_host.cpp::mlsp_load_npy_clouds`), the TPU framework's
    counterpart of the reference's 4-worker DataLoader decode path
    (`PointDA/trainer.py:228-236`). FPS down to `num_points` stays on
    device either way. Falls back to the numpy path transparently.
    """
    import os as _os

    if native_ingest is None:
        native_ingest = _os.environ.get("MLSP_NATIVE_INGEST", "1") != "0"
    if native_ingest:
        from mlsp_tpu import native

        native_ingest = native.available()
    if not native_ingest:
        return standardize_clouds(
            [np.load(f) for f in files], num_points,
            rotate_axis=rotate_axis, rotate_angle=rotate_angle,
            rotate_mask=rotate_mask,
        )

    from mlsp_tpu import native

    sizes = native.npy_sizes(files)
    out = np.empty((len(files), num_points, 3), np.float32)
    # Same pow2 bucketing as standardize_clouds: small clouds tile-pad
    # straight to num_points; big ones pad to a pow2 bucket then FPS.
    buckets: dict[int, list[int]] = {}
    for i, p in enumerate(sizes):
        padded = (num_points if p <= num_points
                  else 1 << (int(p) - 1).bit_length())
        buckets.setdefault(padded, []).append(i)
    for padded, ids in buckets.items():
        for s in range(0, len(ids), _PAD_CHUNK):
            sel = ids[s : s + _PAD_CHUNK]
            chunk, _ = native.load_npy_clouds(
                [files[i] for i in sel], padded, unit_cube=True,
                rotate_axis=rotate_axis, rotate_angle=rotate_angle,
                rotate_mask=(None if rotate_mask is None
                             else rotate_mask[np.asarray(sel)]),
            )
            out[np.asarray(sel)] = (
                chunk if padded == num_points else _fps_chunk(chunk, num_points)
            )
    return out
