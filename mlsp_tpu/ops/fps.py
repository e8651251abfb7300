"""Farthest-point sampling on device.

TPU-native replacement for the reference's CUDA `pointnet2_ops.
furthest_point_sample` (`PointDA/Models.py:16-23`) and the torch/numpy
loops at `utils/pc_utils.py:137-187`. FPS is inherently sequential in the
number of samples, so we run it as a `lax.fori_loop` whose body is fully
vectorised over batch and points (one [B, N] distance update + argmax per
iteration) — the same greedy recursion, traced once and compiled.

A useful property exploited by PCM mixup (`MLSP/PCM.py:26-31` draws a
*data-dependent* number of samples): the greedy FPS ordering is prefix-
closed — the first m indices of an N-sample ordering ARE the m-sample FPS
result for the same start point. `fps` therefore returns the full ordering
requested and callers slice/mask prefixes with traced lengths, keeping all
shapes static under jit.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax


@functools.partial(jax.jit, static_argnames=("npoint", "backend"))
def fps(
    xyz: jax.Array, npoint: int, start_idx: jax.Array, backend: str = "auto"
) -> jax.Array:
    """Greedy farthest-point sampling.

    Args:
      xyz: [B, N, 3] points.
      npoint: number of samples (static).
      start_idx: int [B] index of the first centroid per cloud (the
        reference draws it uniformly; pass `jax.random.randint` output).
      backend: "auto" (Pallas kernel on TPU), "pallas", or "xla".

    Returns:
      int32 [B, npoint] sampled indices (first column == start_idx).
    """
    if backend == "auto":
        backend = "pallas" if jax.default_backend() == "tpu" else "xla"
    if backend == "pallas":
        from mlsp_tpu.ops.pallas.fps_pallas import fps_pallas

        return fps_pallas(xyz, npoint, start_idx)
    B, N, _ = xyz.shape

    def body(i, carry):
        mindist, farthest, out = carry
        out = out.at[:, i].set(farthest)
        centroid = jnp.take_along_axis(xyz, farthest[:, None, None], axis=1)
        d = jnp.sum(jnp.square(xyz - centroid), axis=-1)  # [B, N]
        mindist = jnp.minimum(mindist, d)
        farthest = jnp.argmax(mindist, axis=-1).astype(jnp.int32)
        return mindist, farthest, out

    init = (
        jnp.full((B, N), jnp.inf, dtype=jnp.float32),
        start_idx.astype(jnp.int32),
        jnp.zeros((B, npoint), dtype=jnp.int32),
    )
    _, _, out = lax.fori_loop(0, npoint, body, init)
    return out


def fps_gather(xyz: jax.Array, idx: jax.Array) -> jax.Array:
    """Gather sampled points: xyz [B, N, C], idx [B, S] -> [B, S, C]."""
    return jnp.take_along_axis(xyz, idx[..., None], axis=1)
