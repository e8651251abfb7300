"""Simulated single-view scan occlusion, vectorised on device.

Port of `mlsp.scan_input` / `p_scan` (`MLSP/mlsp.py:54-89`): rotate the
cloud randomly in 3D, project onto a (y, z) pixel grid, keep only the
front-most point (max x) per pixel, zero out the rest. The reference does
this in a Python loop per point per cloud on CPU; here it is a pair of
segment reductions with static shapes.

Pixel size is drawn uniformly from [0.045, 0.075] per *batch* in the
reference (`mlsp.py:56` draws once per call); we keep one draw per call.
The cell count (2/pixel_size)^2 is data-dependent, so we reduce over a
static upper bound of cells and compute cell ids arithmetically.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from mlsp_tpu.transforms.augment import random_rotate_3d

_PIX_MIN, _PIX_MAX = 0.045, 0.075
# pixel = int(2/pixel_size) <= int(2/0.045) = 44; lists are (pixel+5)^2 long.
_MAX_CELLS = (44 + 5) * (44 + 5)


def scan_batch(key: jax.Array, x: jax.Array) -> tuple[jax.Array, jax.Array]:
    """Occlude each cloud to a simulated single-view scan.

    Args:
      key: PRNG key.
      x: [B, N, 3] clouds.

    Returns:
      (scan [B, N, 3], mask [B, N]): `scan` keeps the original coordinates
      of surviving points and zeros elsewhere; `mask` is 1.0 on REMOVED
      points (the reconstruction targets), matching `p_scan`'s mask.
    """
    B, N, _ = x.shape
    kpix, krot = jax.random.split(key)
    pixel_size = jax.random.uniform(kpix, (), jnp.float32, _PIX_MIN, _PIX_MAX)
    pixel = jnp.floor(2.0 / pixel_size)  # traced scalar

    rot = random_rotate_3d(krot, x)  # [B, N, 3]
    cell = (
        (rot[..., 2] + 1.0) / 2.0 * pixel * pixel
        + (rot[..., 1] + 1.0) / 2.0 * pixel
    ).astype(jnp.int32)  # [B, N], values < (pixel+5)^2 <= _MAX_CELLS
    cell = jnp.clip(cell, 0, _MAX_CELLS - 1)

    depth = rot[..., 0]  # keep the max-x point per cell

    def keep_one(cell_b, depth_b):
        seg_max = jax.ops.segment_max(
            depth_b, cell_b, num_segments=_MAX_CELLS, indices_are_sorted=False
        )  # [-inf for empty cells]
        is_front = depth_b == seg_max[cell_b]
        # Tie-break to the lowest index like the reference's first-wins scan.
        ids = jnp.arange(N, dtype=jnp.int32)
        seg_min_id = jax.ops.segment_min(
            jnp.where(is_front, ids, N), cell_b, num_segments=_MAX_CELLS
        )
        return is_front & (ids == seg_min_id[cell_b])

    kept = jax.vmap(keep_one)(cell, depth)  # [B, N] bool
    scan = jnp.where(kept[..., None], x, 0.0)
    mask = 1.0 - kept.astype(x.dtype)
    return scan, mask
