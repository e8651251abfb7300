"""Ball query + local grouping (PointNet++-style set abstraction).

TPU-native equivalent of the CUDA ball-query/grouping in pointnet2_ops
(exercised by BASELINE config #3) and of the reference's torch fallback at
`PointDA/hengshuang_transformer/pointnet_util.py:53-96`: for each sampled
centroid, take the first `nsample` points within `radius`, padding short
neighbourhoods with the first hit (the standard PointNet++ convention).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax

from mlsp_tpu.ops.pairwise import pairwise_sqdist


@functools.partial(jax.jit, static_argnames=("nsample",))
def ball_query(
    xyz: jax.Array, centers: jax.Array, radius: float | jax.Array, nsample: int
) -> jax.Array:
    """First `nsample` point indices within `radius` of each center.

    Args:
      xyz: [B, N, 3] points.
      centers: [B, S, 3] query centroids.
      radius: ball radius.
      nsample: neighbours per ball (static).

    Returns:
      int32 [B, S, nsample]; balls with fewer than nsample hits repeat
      their first hit, empty balls fall back to index 0.
    """
    N = xyz.shape[1]
    d = pairwise_sqdist(centers, xyz)  # [B, S, N]
    within = d <= jnp.asarray(radius, jnp.float32) ** 2
    ranks = jax.lax.broadcasted_iota(jnp.int32, d.shape, dimension=2)
    keyed = jnp.where(within, ranks, N)  # out-of-ball points sort last
    neg_topk, _ = lax.top_k(-keyed, nsample)  # nsample smallest ranks
    idx = -neg_topk
    first = idx[..., :1]
    first = jnp.where(first >= N, 0, first)  # empty ball -> index 0
    return jnp.where(idx >= N, first, idx).astype(jnp.int32)


def group_points(
    xyz: jax.Array,
    feats: jax.Array | None,
    centers: jax.Array,
    idx: jax.Array,
) -> jax.Array:
    """Gather + center-normalise grouped neighbourhoods.

    Args:
      xyz: [B, N, 3] points.
      feats: optional [B, N, C] features to concatenate.
      centers: [B, S, 3] centroids.
      idx: int [B, S, nsample] from `ball_query` (or kNN).

    Returns:
      [B, S, nsample, 3(+C)] local coordinates (xyz - center), with point
      features appended when given.
    """
    B, S, K = idx.shape
    flat = idx.reshape(B, S * K)
    g_xyz = jnp.take_along_axis(xyz, flat[..., None], axis=1).reshape(B, S, K, 3)
    g_xyz = g_xyz - centers[:, :, None, :]
    if feats is None:
        return g_xyz
    C = feats.shape[-1]
    g_f = jnp.take_along_axis(feats, flat[..., None], axis=1).reshape(B, S, K, C)
    return jnp.concatenate([g_xyz, g_f], axis=-1)
