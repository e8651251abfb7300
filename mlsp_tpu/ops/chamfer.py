"""Masked Chamfer distance and nearest-index transport.

Faithful TPU port of the reference semantics in `MLSP/mlsp.py:115-238`
(`chamfer_distance`, `reconstruction_loss`) and `:184-220` (`findindexs`),
including the mask trick: points outside the deformed region get +100
added to their column so the row-min never selects them, and row terms
are weighted by the mask so only deformed points contribute.

Layout: points are [B, N, 3] channels-last, masks are [B, N] (the
reference carries [B, C, N] masks and slices coordinate 0; ours is that
slice directly).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from mlsp_tpu.ops.pairwise import pairwise_sqdist

_BIG = 100.0


def _masked_min_dist(p1: jax.Array, p2: jax.Array, mask: jax.Array):
    """Row-min of ||p1_i - p2_j||^2 with non-masked p2 columns pushed away.

    Returns (min_dist [B, N], argmin [B, N])."""
    d = pairwise_sqdist(p1, p2)  # [B, N, M]
    d = d + (1.0 - mask)[:, None, :] * _BIG
    return jnp.min(d, axis=-1), jnp.argmin(d, axis=-1).astype(jnp.int32)


def masked_chamfer(p1: jax.Array, p2: jax.Array, mask: jax.Array) -> jax.Array:
    """One-directional masked Chamfer term (`mlsp.py:115-153`).

    Args:
      p1: [B, N, 3] query points.
      p2: [B, N, 3] reference points.
      mask: [B, N] 1.0 for points in the deformed region (applies to both
        the p2 columns and the p1 row weights, as in the reference).

    Returns:
      scalar: sum over batch of (masked mean over points).
    """
    mind, _ = _masked_min_dist(p1, p2, mask)
    # Guard: a cloud with no eligible voxel has an all-zero mask; the
    # reference would divide 0/0 (NaN loss). Such clouds contribute 0.
    denom = jnp.maximum(jnp.sum(mask, axis=-1), 1.0)
    per_cloud = jnp.sum(mind * mask, axis=-1) / denom
    return jnp.sum(per_cloud)


def reconstruction_loss(pred: jax.Array, gold: jax.Array, mask: jax.Array) -> jax.Array:
    """Symmetric masked Chamfer, averaged over batch (`mlsp.py:156-182`)."""
    batch = pred.shape[0]
    return (masked_chamfer(gold, pred, mask) + masked_chamfer(pred, gold, mask)) / batch


def nearest_index_pair(
    pred: jax.Array, gold: jax.Array, mask: jax.Array
) -> tuple[jax.Array, jax.Array]:
    """Masked nearest-neighbour index maps in both directions.

    Port of `findindexs` (`mlsp.py:184-220`): used to transport per-point
    normal/density labels between the deformed prediction and the original
    cloud.

    Returns:
      (idx_pred_to_gold [B, N], idx_gold_to_pred [B, N]) int32.
    """
    _, i1 = _masked_min_dist(pred, gold, mask)
    _, i2 = _masked_min_dist(gold, pred, mask)
    return i1, i2
