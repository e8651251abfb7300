"""Additional augmentations from `utils/metapc_utils.py` and
`MLSP/mlsp.py:91-94` — the transform vocabulary of the reference's
(unused-by-trainers but public) meta-dataloader path, as PRNG-keyed
pure functions over [..., N, 3] clouds.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from mlsp_tpu.transforms.augment import _axis_rotation


def normalize_pc(x: jax.Array) -> jax.Array:
    """`metapc_utils.normal_pc`: center + scale by max norm (same as
    scale_to_unit_cube but kept under its reference name)."""
    x = x - jnp.mean(x, axis=-2, keepdims=True)
    return x / jnp.max(jnp.linalg.norm(x, axis=-1), axis=-1)[..., None, None]


def scale(key, x, lo: float = 2.0 / 3.0, hi: float = 3.0 / 2.0):
    """`PointcloudScale`: one uniform scalar per cloud."""
    s = jax.random.uniform(key, x.shape[:-2] + (1, 1), x.dtype, lo, hi)
    return x * s


def rotate_perturbation(key, x, angle_sigma: float = 0.06, angle_clip: float = 0.18):
    """`PointcloudRotatePerturbation`: small clipped random 3-axis rotation."""
    ang = jnp.clip(
        angle_sigma * jax.random.normal(key, x.shape[:-2] + (3,)),
        -angle_clip, angle_clip,
    )
    c, s = jnp.cos(ang), jnp.sin(ang)
    R = (
        _axis_rotation("x", c[..., 0], s[..., 0])
        @ _axis_rotation("y", c[..., 1], s[..., 1])
        @ _axis_rotation("z", c[..., 2], s[..., 2])
    )
    return jnp.einsum("...nc,...cd->...nd", x, R)


def drop_hole(key, x, p: float = 0.24):
    """`mlsp.drop_hole` / `metapc_utils.drop_hole`, static-shape variant:
    pick a random point, mark the p*N nearest points as dropped.

    Returns (x, keep_mask [..., N]) — the reference physically removes
    points (dynamic shape); here callers mask or compact as needed.
    """
    N = x.shape[-2]
    kpick = key
    center_idx = jax.random.randint(kpick, x.shape[:-2], 0, N)
    center = jnp.take_along_axis(x, center_idx[..., None, None], axis=-2)
    d = jnp.sum((x - center) ** 2, axis=-1)
    thresh = jnp.quantile(d, p, axis=-1, keepdims=True)
    return x, (d > thresh).astype(x.dtype)


def viewpoint_dropout(key, x, v_point=(1.0, 0.0, 0.0), gate: float = 1.0):
    """`metapc_utils.density`: probabilistically drop points far from a
    viewpoint (distance-weighted dropout). Static-shape: returns a keep
    mask."""
    kg, kd = jax.random.split(key)
    v = jnp.asarray(v_point, x.dtype)
    dist = jnp.sqrt(jnp.sum((x - v) ** 2, axis=-1))
    dist_n = dist / jnp.max(dist, axis=-1, keepdims=True)
    drop_p = dist_n * gate
    keep = jax.random.uniform(kd, drop_p.shape) >= drop_p
    return x, keep.astype(x.dtype)


def draw_from_uniform(key, gap, region_mean, num_points: int):
    """`pc_utils.draw_from_uniform`: uniform points in a box around a
    region center."""
    lo = jnp.asarray(region_mean) - jnp.asarray(gap)
    hi = jnp.asarray(region_mean) + jnp.asarray(gap)
    return jax.random.uniform(key, (num_points, 3), minval=lo, maxval=hi)
