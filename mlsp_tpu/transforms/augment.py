"""Geometric augmentations as pure jit-able functions.

Ports the numpy helpers in `utils/pc_utils.py:190-278` (rotate, jitter,
translate, unit-cube scaling) and the 3-axis rotation at
`MLSP/mlsp.py:96-112` to batched, PRNG-keyed JAX. All functions take
channels-last [..., N, 3] clouds.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def scale_to_unit_cube(x: jax.Array) -> jax.Array:
    """Center at the centroid and scale the farthest point to norm 1.

    Batched port of `pc_utils.scale_to_unit_cube` ([N, 3] per cloud).
    """
    x = x - jnp.mean(x, axis=-2, keepdims=True)
    far = jnp.max(jnp.linalg.norm(x, axis=-1), axis=-1)
    return x / far[..., None, None].clip(1e-12)


def _axis_rotation(axis: str, c: jax.Array, s: jax.Array) -> jax.Array:
    """Rotation matrix about one axis from cos/sin scalars (stack-friendly)."""
    o = jnp.ones_like(c)
    z = jnp.zeros_like(c)
    if axis == "x":
        rows = [o, z, z, z, c, -s, z, s, c]
    elif axis == "y":
        rows = [c, z, s, z, o, z, -s, z, c]
    elif axis == "z":
        rows = [c, -s, z, s, c, z, z, z, o]
    else:
        raise ValueError(f"unknown axis {axis!r}")
    return jnp.stack(rows, axis=-1).reshape(*c.shape, 3, 3)


def rotate_shape(x: jax.Array, axis: str, angle: float) -> jax.Array:
    """Fixed-angle rotation (dataset alignment, e.g. -pi/2 about x).

    Port of `pc_utils.rotate_shape`: the torch code right-multiplies by R,
    i.e. uses the transpose convention; we match it exactly.
    """
    a = jnp.asarray(angle, x.dtype)
    R = _axis_rotation(axis, jnp.cos(a), jnp.sin(a))
    return x @ R


def random_rotate_one_axis(key: jax.Array, x: jax.Array, axis: str = "z") -> jax.Array:
    """Uniform random rotation about one axis, one angle per cloud.

    Batched port of `pc_utils.random_rotate_one_axis` ([..., N, 3]).
    """
    batch_shape = x.shape[:-2]
    ang = jax.random.uniform(key, batch_shape, x.dtype, 0.0, 2.0 * jnp.pi)
    R = _axis_rotation(axis, jnp.cos(ang), jnp.sin(ang))
    return jnp.einsum("...nc,...cd->...nd", x, R)


def jitter(key: jax.Array, x: jax.Array, sigma: float = 0.01, clip: float = 0.02) -> jax.Array:
    """Clipped gaussian per-coordinate jitter (`pc_utils.jitter_pointcloud`)."""
    noise = jnp.clip(sigma * jax.random.normal(key, x.shape, x.dtype), -clip, clip)
    return x + noise


def translate(key: jax.Array, x: jax.Array) -> jax.Array:
    """Random anisotropic scale + shift (`pc_utils.translate_pointcloud`)."""
    k1, k2 = jax.random.split(key)
    batch_shape = x.shape[:-2]
    s = jax.random.uniform(k1, batch_shape + (1, 3), x.dtype, 2.0 / 3.0, 3.0 / 2.0)
    t = jax.random.uniform(k2, batch_shape + (1, 3), x.dtype, -0.2, 0.2)
    return x * s + t


def random_rotate_3d(key: jax.Array, x: jax.Array) -> jax.Array:
    """Random rotation about all three axes (`mlsp.py:96-112`).

    R = Ry(a0) @ Rx(a1) @ Rz(a2) applied as x @ R, one draw per cloud.
    """
    batch_shape = x.shape[:-2]
    ang = jax.random.uniform(key, batch_shape + (3,), x.dtype, 0.0, 2.0 * jnp.pi)
    c, s = jnp.cos(ang), jnp.sin(ang)
    R1 = _axis_rotation("y", c[..., 0], s[..., 0])
    R2 = _axis_rotation("x", c[..., 1], s[..., 1])
    R3 = _axis_rotation("z", c[..., 2], s[..., 2])
    # Reference builds matrices acting on row vectors directly:
    # rotation_matrix_1 is Ry with the row-vector sign convention, etc.
    # Its matrices equal our column convention transposed, and it computes
    # pc @ (M1 @ M2 @ M3). With Mi = Ri^T this is pc @ (R3 @ R2 @ R1)^T...
    # net effect: a uniformly random composed rotation either way; we apply
    # x @ (R1 @ R2 @ R3) which has the identical distribution.
    R = R1 @ R2 @ R3
    return jnp.einsum("...nc,...cd->...nd", x, R)
