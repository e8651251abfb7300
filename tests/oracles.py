"""Pure-numpy oracles for kernel tests.

Re-derived from the reference's torch/numpy code so device kernels can be
checked against an independent implementation (cf. `utils/pc_utils.py`,
`MLSP/mlsp.py`); no torch, no copying — just the math.
"""

import numpy as np


def sqdist_np(x, y):
    """[N, C] x [M, C] -> [N, M] squared distances."""
    return ((x[:, None, :] - y[None, :, :]) ** 2).sum(-1)


def knn_np(x, k):
    """[N, C] -> [N, k] nearest indices (self included, stable ties)."""
    d = sqdist_np(x, x)
    return np.argsort(d, axis=-1, kind="stable")[:, :k]


def fps_np(xyz, npoint, start):
    """[N, 3] greedy FPS from `start` -> [npoint] indices.

    Same recursion as `pc_utils.farthest_point_sample_np` with an explicit
    start index.
    """
    N = xyz.shape[0]
    out = np.zeros(npoint, dtype=np.int64)
    dist = np.full(N, np.inf)
    far = start
    for i in range(npoint):
        out[i] = far
        d = ((xyz - xyz[far]) ** 2).sum(-1)
        dist = np.minimum(dist, d)
        far = int(np.argmax(dist))
    return out


def normals_np(xyz, k):
    """[N, 3] kNN-PCA normals via numpy eigh (sign unnormalised)."""
    idx = knn_np(xyz, k)
    out = np.zeros_like(xyz)
    for i in range(xyz.shape[0]):
        nb = xyz[idx[i]]
        nb = nb - nb.mean(0)
        cov = nb.T @ nb / k
        w, v = np.linalg.eigh(cov)
        out[i] = v[:, 0]
    return out


def radius_count_np(xyz, radius, cap=100):
    """PCL-quirk neighbour count (see mlsp_tpu.ops.density docstring).

    Faithful to the reference (`MLSP/mlsp.py:248-255`): FLANN returns the
    `cap` NEAREST in-radius neighbours sorted by distance; the reference
    counts returned indices != 0. Simulated literally: sort, truncate,
    count nonzero indices.
    """
    d = sqdist_np(xyz, xyz)
    r2 = radius**2
    out = np.zeros(xyz.shape[0])
    for i in range(xyz.shape[0]):
        hits = np.where(d[i] <= r2)[0]
        returned = hits[np.argsort(d[i][hits], kind="stable")][:cap]
        out[i] = np.count_nonzero(returned)
    return out


def density_labels_np(xyz, radius, num_cls=16, pergroup=2.0, shift=0.0):
    row = radius_count_np(xyz, radius) - shift
    row = np.clip(row, 0, (num_cls - 1) * pergroup)
    lo = np.floor(row / pergroup).astype(int)
    hi = np.ceil(row / pergroup).astype(int)
    eye = np.eye(num_cls)
    return (eye[lo] + eye[hi]) / 2.0, row


def masked_chamfer_np(p1, p2, mask):
    """Reference chamfer_distance semantics ([B, N, 3], mask [B, N])."""
    total = 0.0
    for b in range(p1.shape[0]):
        d = sqdist_np(p1[b], p2[b])
        d = d + (1.0 - mask[b])[None, :] * 100.0
        mind = d.min(-1)
        total += (mind * mask[b]).sum() / mask[b].sum()
    return total


def reconstruction_loss_np(pred, gold, mask):
    B = pred.shape[0]
    return (masked_chamfer_np(gold, pred, mask) + masked_chamfer_np(pred, gold, mask)) / B


def ball_query_np(xyz, centers, radius, nsample):
    """PointNet++ ball query with first-hit padding."""
    S = centers.shape[0]
    out = np.zeros((S, nsample), dtype=np.int64)
    for s in range(S):
        hits = np.nonzero(((xyz - centers[s]) ** 2).sum(-1) <= radius**2)[0]
        if len(hits) == 0:
            out[s] = 0
        else:
            take = hits[:nsample]
            out[s, : len(take)] = take
            out[s, len(take):] = take[0]
    return out
