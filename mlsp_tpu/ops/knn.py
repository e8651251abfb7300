"""Brute-force k-nearest-neighbour graph on device.

TPU-native replacement for the reference's KNN_CUDA extension
(`PointDA/model_utils.py:6,9-16` and `Group.forward` at `:175,188`).
For N ~ 1024-2048 the full distance matrix fits comfortably; we lean on
the MXU for the distance matmul and `lax.top_k` for selection. A fused
Pallas kernel that never materialises [N, N] in HBM lives in
`mlsp_tpu.ops.pallas.knn_pallas` and is used via `knn_indices(...,
backend="pallas")` where profitable.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax

from mlsp_tpu.ops.pairwise import pairwise_sqdist, self_sqdist


def _resolve_backend(backend: str) -> str:
    """Resolve "auto": under an active points-sharding mesh, prefer the
    XLA path — it routes through `pairwise_sqdist`, the one producer
    that carries the P("data", "points") constraint. The Pallas kernel
    keeps the distance matrix in VMEM (nothing to shard there), but
    using it would silently skip the advertised O(N^2) partitioning of
    the kNN graph build. Otherwise: Pallas on TPU, XLA elsewhere."""
    from mlsp_tpu.parallel.mesh import active_points_mesh

    if backend != "auto":
        return backend
    if active_points_mesh() is not None:
        return "xla"
    return "pallas" if jax.default_backend() == "tpu" else "xla"


@functools.partial(jax.jit, static_argnames=("k", "backend"))
def knn_indices(
    x: jax.Array,
    k: int,
    y: jax.Array | None = None,
    backend: str = "auto",
) -> jax.Array:
    """Indices of the k nearest points of `y` (default: `x`) per point of `x`.

    Matches the reference semantics (`model_utils.py:9-16`): self-matches are
    included (distance 0 ranks first), ties broken by lower index (torch
    top-k on the negated distance behaves the same for distinct values).

    Args:
      x: [..., N, C] query points.
      k: number of neighbours.
      y: [..., M, C] database points; defaults to x.

    Returns:
      int32 [..., N, k] neighbour indices into `y`.
    """
    from mlsp_tpu.parallel.mesh import active_points_mesh, note_unconstrained_trace

    m = (x if y is None else y).shape[-2]
    if k > m:
        raise ValueError(
            f"knn_indices: k={k} exceeds the {m} database points")
    backend = _resolve_backend(backend)
    if backend == "pallas" and y is None and x.ndim == 3:
        from mlsp_tpu.ops.pallas.knn_pallas import knn_pallas

        if active_points_mesh() is None:
            # Same staleness protocol as `pairwise_sqdist`: this trace
            # has no constraint, so the next points_sharding entry must
            # retrace rather than reuse it.
            note_unconstrained_trace()
        return knn_pallas(x, k)
    d = self_sqdist(x) if y is None else pairwise_sqdist(x, y)
    _, idx = lax.top_k(-d, k)
    return idx.astype(jnp.int32)


def knn_gather(feats: jax.Array, idx: jax.Array) -> jax.Array:
    """Gather per-neighbour features.

    Args:
      feats: [..., M, C] features.
      idx: int [..., N, k] indices into the M axis.

    Returns:
      [..., N, k, C] gathered features.
    """
    return jnp.take_along_axis(feats[..., None, :], idx[..., None], axis=-3)


def edge_features(feats: jax.Array, idx: jax.Array) -> jax.Array:
    """EdgeConv input features: concat(x_j - x_i, x_i) per neighbour.

    TPU-layout equivalent of `get_graph_feature` (`model_utils.py:18-42`),
    channels-last: returns [..., N, k, 2C] instead of torch's [B, 2C, N, k].
    """
    neigh = knn_gather(feats, idx)  # [..., N, k, C]
    center = jnp.broadcast_to(feats[..., :, None, :], neigh.shape)
    return jnp.concatenate([neigh - center, center], axis=-1)
