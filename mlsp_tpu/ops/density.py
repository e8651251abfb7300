"""On-device point-cardinality (density) ground-truth labels.

TPU-native replacement for the reference's per-cloud C++ PCL kd-tree
radius search (`MLSP/mlsp.py:240-272`, `cal_density`): for every point,
count neighbours within `radius` (capped at K=100), then build a soft
"two-hot" class vector over `num_cls` bins of width `pergroup`.

For N = 1024/2048 a brute-force masked count over the pairwise distance
matrix is a single fused matmul + compare + row-sum — much faster than a
tree, and it runs inside the jitted train step.

Parity quirks reproduced from the reference:
  * PCL returns a 0-padded index matrix and the reference counts entries
    `!= 0`, so point index 0 is never counted as a neighbour — but only
    when it is actually among the K returned (the K nearest in radius).
  * Counts are capped at K (=100) returned neighbours.
  * `row = clip(count - shift, 0, (num_cls-1)*pergroup)`; the class vector
    is the mean of one-hots at floor(row/pergroup) and ceil(row/pergroup).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from mlsp_tpu.ops.pairwise import self_sqdist


@functools.partial(jax.jit, static_argnames=("cap",))
def radius_count(xyz: jax.Array, radius: jax.Array | float, cap: int = 100) -> jax.Array:
    """Neighbours within `radius` per point, PCL-quirk compatible.

    Args:
      xyz: [B, N, 3] points.
      radius: search radius (scalar).
      cap: max returned neighbours (PCL K argument, reference uses 100).

    Returns:
      float32 [B, N] counts.
    """
    d = self_sqdist(xyz)  # [B, N, N]
    r2 = jnp.asarray(radius, jnp.float32) ** 2
    within = (d <= r2).astype(jnp.float32)
    total = jnp.sum(within, axis=-1)  # includes self
    # PCL/FLANN returns the `cap` NEAREST in-radius neighbours (sorted by
    # distance); the reference then counts returned indices != 0, so point
    # index 0 is excluded — but ONLY when it makes the top-`cap` cut. When
    # the cap binds and point 0 is in radius yet not among the `cap`
    # nearest, it was never returned and nothing is excluded. Rank point 0
    # by counting in-radius points strictly closer (distance ties at point
    # 0's distance are measure-zero and FLANN orders them arbitrarily).
    d0 = d[..., 0:1]  # [B, N, 1] squared distance to point 0
    closer = jnp.sum(within * (d < d0).astype(jnp.float32), axis=-1)
    zero_returned = within[..., 0] * (closer < float(cap)).astype(jnp.float32)
    count = jnp.minimum(total, float(cap)) - zero_returned
    return jnp.maximum(count, 0.0)


@functools.partial(jax.jit, static_argnames=("num_cls", "pergroup", "shift", "cap"))
def density_labels(
    xyz: jax.Array,
    radius: jax.Array | float,
    num_cls: int = 16,
    pergroup: float = 2.0,
    shift: float = 0.0,
    cap: int = 100,
) -> tuple[jax.Array, jax.Array]:
    """Soft two-hot cardinality class vectors + scalar regression targets.

    Mirrors `cal_density` (`MLSP/mlsp.py:240-272`).

    Returns:
      (cls, val): cls float32 [B, N, num_cls] soft labels summing to 1,
      val float32 [B, N] clipped shifted counts (the L1 target).
    """
    row = radius_count(xyz, radius, cap=cap) - shift
    row = jnp.clip(row, 0.0, float((num_cls - 1) * pergroup))
    lo = jnp.floor(row / pergroup).astype(jnp.int32)
    hi = jnp.ceil(row / pergroup).astype(jnp.int32)
    one_lo = jax.nn.one_hot(lo, num_cls, dtype=jnp.float32)
    one_hi = jax.nn.one_hot(hi, num_cls, dtype=jnp.float32)
    cls = 0.5 * (one_lo + one_hi)
    return cls, row
