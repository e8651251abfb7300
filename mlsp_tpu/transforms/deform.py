"""Voxel-region masking + collapse ("DefRec" deformation), fully on device.

Port of `mlsp.deform_input` (`MLSP/mlsp.py:10-51`) and its helpers
(`utils/pc_utils.py:13-73`): partition the unit cube into n^3 voxels,
pick a random voxel with >= min_pts points, and replace those points with
gaussian noise around the voxel center. The reference runs a Python loop
per batch element on CPU; here it is one vectorised masked update under
`vmap`, same distribution.

The `volume_based_radius` variant (`pc_utils.collapse_to_point`) is also
provided: collapse all points within RADIUS of a randomly chosen
well-populated point.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from mlsp_tpu.ops.pairwise import self_sqdist

NREGIONS = 3
MIN_PTS = 40  # deform_input's local min_pts (mlsp.py:27)
GAUSS_STD = 0.001**0.5  # draw_from_gaussian uses covariance 0.001*I
RADIUS = 0.5  # pc_utils.RADIUS for the radius variant
RADIUS_MIN_POINTS = 20  # pc_utils.MIN_POINTS


def region_means(n: int = NREGIONS) -> jnp.ndarray:
    """[n^3, 3] voxel-center lookup (port of `pc_utils.region_mean`).

    Index layout matches `assign_regions`: id = ix*n^2 + iy*n + iz with
    interval index 0 at coordinate -1 + d/2.
    """
    d = 2.0 / n
    ax = -1.0 + d * (jnp.arange(n, dtype=jnp.float32) + 0.5)
    gx, gy, gz = jnp.meshgrid(ax, ax, ax, indexing="ij")
    return jnp.stack([gx, gy, gz], axis=-1).reshape(-1, 3)


def assign_regions(x: jax.Array, n: int = NREGIONS) -> jax.Array:
    """Voxel id per point: [..., N, 3] -> int32 [..., N].

    Port of `pc_utils.assign_region_to_point`; interval index by floor
    instead of 27 range tests (points exactly on a voxel boundary go to
    the upper voxel — measure-zero difference).
    """
    d = 2.0 / n
    xc = jnp.clip(x, -0.99999999, 0.99999999)
    cell = jnp.clip(jnp.floor((xc + 1.0) / d), 0, n - 1).astype(jnp.int32)
    return cell[..., 0] * n * n + cell[..., 1] * n + cell[..., 2]


@functools.partial(jax.jit, static_argnames=("n", "groups", "min_pts"))
def deform_batch(
    key: jax.Array,
    x: jax.Array,
    n: int = NREGIONS,
    groups: int = 1,
    min_pts: int = MIN_PTS,
) -> tuple[jax.Array, jax.Array]:
    """Collapse `groups` random populated voxels per cloud to gaussian blobs.

    Args:
      key: PRNG key.
      x: [B, N, 3] clouds.
      n: voxel grid resolution per axis.
      groups: number of voxels to deform per cloud (reference default 1).
      min_pts: minimum points for a voxel to be eligible.

    Returns:
      (deformed [B, N, 3], mask [B, N]) — mask 1.0 on replaced points.
    """
    B, N, _ = x.shape
    R = n**3
    lookup = region_means(n)

    rid = assign_regions(x, n)  # [B, N]
    onehot = jax.nn.one_hot(rid, R, dtype=jnp.float32)  # [B, N, R]
    counts = jnp.sum(onehot, axis=1)  # [B, R]

    kperm, knoise = jax.random.split(key)
    # Random per-cloud ordering of regions; take the first `groups` eligible.
    perm = jax.vmap(lambda k: jax.random.permutation(k, R))(
        jax.random.split(kperm, B)
    )  # [B, R]
    eligible = jnp.take_along_axis(counts, perm, axis=1) >= min_pts  # perm order
    picked = eligible & (jnp.cumsum(eligible, axis=1) <= groups)
    # Scatter the picked flags back to region-id space.
    region_sel = jnp.zeros((B, R), bool)
    region_sel = jax.vmap(lambda s, p, v: s.at[p].set(v))(region_sel, perm, picked)

    mask = jnp.take_along_axis(region_sel, rid, axis=1)  # [B, N] bool
    centers = lookup[rid]  # [B, N, 3]
    noise = GAUSS_STD * jax.random.normal(knoise, x.shape, x.dtype)
    deformed = jnp.where(mask[..., None], centers + noise, x)
    return deformed, mask.astype(x.dtype)


@jax.jit
def collapse_to_point_batch(key: jax.Array, x: jax.Array) -> tuple[jax.Array, jax.Array]:
    """`volume_based_radius` deformation (`pc_utils.collapse_to_point`).

    Picks, per cloud, a random point that has >= RADIUS_MIN_POINTS
    neighbours within RADIUS and collapses that neighbourhood to a
    gaussian blob around it.

    Returns (deformed [B, N, 3], mask [B, N]).
    """
    B, N, _ = x.shape
    d = self_sqdist(x)  # [B, N, N]
    within = d <= RADIUS**2
    eligible = jnp.sum(within, axis=-1) >= RADIUS_MIN_POINTS  # [B, N]

    kpick, knoise = jax.random.split(key)
    # Uniform choice among eligible points via gumbel-max on the mask.
    g = jax.random.gumbel(kpick, (B, N))
    pick = jnp.argmax(jnp.where(eligible, g, -jnp.inf), axis=-1)  # [B]
    point = jnp.take_along_axis(x, pick[:, None, None], axis=1)  # [B, 1, 3]
    mask = jnp.take_along_axis(within, pick[:, None, None], axis=1)[:, 0]  # [B, N]
    noise = GAUSS_STD * jax.random.normal(knoise, x.shape, x.dtype)
    deformed = jnp.where(mask[..., None], point + noise, x)
    return deformed, mask.astype(x.dtype)
