"""Fused kNN-neighbourhood-moments Pallas kernel (gather-free normals).

`estimate_normals` needs, per point, the mean and second moment of its k
nearest neighbours. The straightforward path is kNN indices + a
[B, N, k, 3] gather — but TPU gathers here cost per ROW (~flat in
channel width), so the gather is as expensive as an EdgeConv's. This
kernel never gathers: the iterative masked-argmin that selects the k
minima (same selection loop as `knn_pallas`, same tie-break) accumulates
a {0,1} selection mask [TILE, N], and the neighbourhood sums become two
MXU matmuls against the database:

    s1 = M @ x        [TILE, 3]   (sum of neighbour coords)
    s2 = M @ (x ⊗ x)  [TILE, 9]   (sum of neighbour outer products)

Covariance follows as s2/k − μμᵀ outside the kernel. Distances, the
selection state, and the mask all stay in VMEM; HBM sees only
[B, N, 3] in and [B, N, 12] out.

Replaces the PCL NormalEstimation path of the reference
(`PointDA/trainer.py:158-188`) together with `ops/normals.py`.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _moments_kernel(xq_ref, xdb_ref, s1_ref, s2_ref, *, k: int):
    xq = xq_ref[0]  # [TILE, 3]
    xdb = xdb_ref[0]  # [N, 3]
    qq = jnp.sum(xq * xq, axis=-1, keepdims=True)
    dd = jnp.sum(xdb * xdb, axis=-1, keepdims=True)
    inner = jax.lax.dot_general(
        xq, xdb,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )  # [TILE, N]
    dist = qq - 2.0 * inner + dd.T
    col = jax.lax.broadcasted_iota(jnp.int32, dist.shape, 1)

    d = dist
    sel = jnp.zeros(dist.shape, jnp.float32)
    for _ in range(k):  # same selection + tie-break as knn_pallas
        a = jnp.argmin(d, axis=-1).astype(jnp.int32)
        hit = col == a[:, None]
        sel = jnp.where(hit, 1.0, sel)
        d = jnp.where(hit, jnp.inf, d)

    # Neighbourhood sums as MXU matmuls against the database. The outer
    # products go column-block by column-block ([N, 3] x scalar column):
    # Mosaic on this chip rejects the [N, 3, 3] -> [N, 9] shape cast.
    def msum(mat):
        return jax.lax.dot_general(
            sel, mat, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )

    s1_ref[0] = msum(xdb)
    for j in range(3):
        s2_ref[0, :, 3 * j : 3 * (j + 1)] = msum(xdb * xdb[:, j : j + 1])


@functools.partial(jax.jit, static_argnames=("k", "tile", "interpret"))
def knn_moments_pallas(
    x: jax.Array, k: int, tile: int = 128, interpret: bool = False
):
    """Per-point kNN neighbourhood sums, gather-free.

    Args:
      x: [B, N, 3] float32 points.
      k: neighbourhood size (self included, like `knn_indices`).

    Returns:
      (s1 [B, N, 3], s2 [B, N, 9]) — sum of the k nearest neighbours'
      coordinates and of their outer products (row-major 3x3).
    """
    B, N, C = x.shape
    assert C == 3, "moments kernel is specialised to 3-D coordinates"
    if N % tile != 0:
        tile = min(tile, N)
        while N % tile != 0:
            tile //= 2
    grid = (B, N // tile)
    x = x.astype(jnp.float32)

    s1, s2 = pl.pallas_call(
        functools.partial(_moments_kernel, k=k),
        out_shape=(
            jax.ShapeDtypeStruct((B, N, 3), jnp.float32),
            jax.ShapeDtypeStruct((B, N, 9), jnp.float32),
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, tile, C), lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, N, C), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, tile, 3), lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile, 9), lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM),
        ),
        interpret=interpret,
    )(x, x)
    return s1, s2
