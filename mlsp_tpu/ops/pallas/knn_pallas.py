"""Fused pairwise-distance + top-k Pallas kernel for brute-force kNN.

The XLA path (`mlsp_tpu.ops.knn`) materialises the [B, N, N] distance
tensor in HBM (128 MB at B=32, N=1024) and runs a full sort-based top_k;
DGCNN calls it 5x per forward. This kernel tiles queries into VMEM,
computes each [TILE, N] distance block on the MXU, and extracts the k
minima by iterative masked row-min — O(kN) selection, no HBM round-trip
for distances.

Semantics match `knn_indices`: squared euclidean, self-match included
(distance 0 ranks first), ties broken toward the lower index.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _knn_kernel(xq_ref, xdb_ref, out_ref, *, k: int):
    xq = xq_ref[0]  # [TILE, C]
    xdb = xdb_ref[0]  # [N, C]
    qq = jnp.sum(xq * xq, axis=-1, keepdims=True)  # [TILE, 1]
    dd = jnp.sum(xdb * xdb, axis=-1, keepdims=True)  # [N, 1]
    inner = jax.lax.dot_general(
        xq, xdb,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,  # f32 passes on the MXU —
        # bf16 rounding reorders neighbours vs the XLA reference path
    )  # [TILE, N]
    dist = qq - 2.0 * inner + dd.T
    # Lowest-index tie-break comes from jnp.argmin's first-match
    # semantics — no bias term needed (or representable: 1e-12 is far
    # below one ulp of typical f32 distances).
    col = jax.lax.broadcasted_iota(jnp.int32, dist.shape, 1)

    d = dist
    for j in range(k):
        a = jnp.argmin(d, axis=-1).astype(jnp.int32)  # [TILE]
        out_ref[0, :, j] = a
        hit = col == a[:, None]
        d = jnp.where(hit, jnp.inf, d)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2, 3))
def knn_pallas(x: jax.Array, k: int, tile: int = 128, interpret: bool = False) -> jax.Array:
    """kNN indices via the fused kernel.

    Args:
      x: [B, N, C] float32 points/features (N multiple of `tile`).
      k: neighbours per point.

    Returns:
      int32 [B, N, k].
    """
    B, N, C = x.shape
    if N % tile != 0:
        tile = min(tile, N)
        while N % tile != 0:
            tile //= 2
    grid = (B, N // tile)
    x = x.astype(jnp.float32)

    out = pl.pallas_call(
        functools.partial(_knn_kernel, k=k),
        out_shape=jax.ShapeDtypeStruct((B, N, k), jnp.int32),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, tile, C), lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, N, C), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, tile, k), lambda b, i: (b, i, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(x, x)
    return out


# Neighbour indices are integers: no gradient flows through the kernel
# (same semantics as differentiating through XLA's top_k index output).
def _knn_fwd(x, k, tile, interpret):
    return knn_pallas(x, k, tile, interpret), x.shape


def _knn_bwd(k, tile, interpret, shape, g):
    del g
    return (jnp.zeros(shape, jnp.float32),)


knn_pallas.defvjp(_knn_fwd, _knn_bwd)
