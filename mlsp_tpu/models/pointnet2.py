"""PointNet++ (SSG) classifier — exercises FPS + ball query + grouping.

The reference relies on CUDA pointnet2_ops for these primitives
(`PointDA/Models.py:11,16-23`; torch fallback at
`hengshuang_transformer/pointnet_util.py:119-176`). Here the set
abstraction is built from :mod:`mlsp_tpu.ops.fps` and
:mod:`mlsp_tpu.ops.grouping`, everything jit-resident.
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn

from mlsp_tpu.models.layers import DenseBN
from mlsp_tpu.ops.fps import fps, fps_gather
from mlsp_tpu.ops.grouping import ball_query, group_points


class SetAbstraction(nn.Module):
    """Sample-group-pool block: FPS centroids, ball-query groups, shared
    MLP over local coords(+feats), max pool per group."""

    npoint: int
    radius: float
    nsample: int
    mlp: tuple[int, ...]
    knn_backend: str = "auto"

    @nn.compact
    def __call__(self, xyz, feats, start_idx, train: bool):
        idx = fps(xyz, self.npoint, start_idx, backend=self.knn_backend)
        centers = fps_gather(xyz, idx)
        gidx = ball_query(xyz, centers, self.radius, self.nsample)
        g = group_points(xyz, feats, centers, gidx)  # [B, S, ns, 3+C]
        for width in self.mlp:
            g = DenseBN(width, "relu")(g, train)
        return centers, jnp.max(g, axis=-2)  # [B, S, mlp[-1]]


class GlobalAbstraction(nn.Module):
    """group_all stage: shared MLP over every point then global max."""

    mlp: tuple[int, ...]

    @nn.compact
    def __call__(self, xyz, feats, train: bool):
        g = jnp.concatenate([xyz, feats], axis=-1)
        for width in self.mlp:
            g = DenseBN(width, "relu")(g, train)
        return jnp.max(g, axis=1)  # [B, mlp[-1]]


class PointNet2SSG(nn.Module):
    """Single-scale-grouping PointNet++ classifier (standard config)."""

    num_classes: int = 10
    dropout: float = 0.4
    knn_backend: str = "auto"

    @nn.compact
    def __call__(self, x, train: bool = False, heads: tuple[str, ...] = (),
                 rng_start=None):
        B = x.shape[0]
        # Deterministic start (point 0) by default: FPS coverage is
        # insensitive to the seed; pass rng_start for stochastic parity.
        if rng_start is None:
            s1 = s2 = jnp.zeros((B,), jnp.int32)
        else:
            s1, s2 = rng_start

        xyz1, f1 = SetAbstraction(512, 0.2, 32, (64, 64, 128),
                                  self.knn_backend)(x, None, s1, train)
        xyz2, f2 = SetAbstraction(128, 0.4, 64, (128, 128, 256),
                                  self.knn_backend)(xyz1, f1, s2, train)
        feat = GlobalAbstraction((256, 512, 1024))(xyz2, f2, train)

        h = DenseBN(512, "relu")(feat, train)
        h = nn.Dropout(self.dropout, deterministic=not train)(h)
        h = DenseBN(256, "relu")(h, train)
        h = nn.Dropout(self.dropout, deterministic=not train)(h)
        return {"feat": feat, "cls": nn.Dense(self.num_classes)(h)}
