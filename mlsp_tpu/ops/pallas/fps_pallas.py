"""Whole-batch farthest-point-sampling Pallas kernel.

The XLA FPS (`mlsp_tpu.ops.fps`) is a `lax.fori_loop` whose per-iteration
cost is dominated by loop/dispatch overhead rather than the tiny [B, N]
vector work. This kernel runs the whole greedy recursion on-core with
every buffer resident in VMEM: mindist updates, row argmax, and the
centroid read (expressed as a one-hot contraction — Mosaic has no
vectorised row gather).

Semantics identical to `ops.fps`: greedy max-min ordering, ties to the
lowest index, first column == start index.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _fps_kernel(start_ref, x_ref, order_ref, mind_ref, *, npoint: int):
    """Writes each point's selection ordinal into order_ref [B, N]
    (npoint sentinel for unselected) — full-array masked stores only;
    Mosaic cannot store to a dynamic column index.

    Coordinates come in transposed as [B, 3, N]: with N on the lane
    dimension the VMEM footprint is ~1 MB (a [B, N, 3] layout pads the
    3-wide lane dim to 128 and blows the 16 MB VMEM budget).
    """
    B, _, N = x_ref.shape
    x = x_ref[...]  # [B, 3, N]
    mind_ref[...] = jnp.full((B, N), jnp.inf, jnp.float32)
    order_ref[...] = jnp.full((B, N), npoint, jnp.int32)
    col = jax.lax.broadcasted_iota(jnp.int32, (B, N), 1)

    def body(i, far):
        sel = col == far[:, None]  # [B, N] one-hot
        order_ref[...] = jnp.where(sel, i, order_ref[...])
        self_f = sel.astype(jnp.float32)
        centroid = jnp.sum(x * self_f[:, None, :], axis=2)  # [B, 3]
        d = jnp.sum(jnp.square(x - centroid[:, :, None]), axis=1)  # [B, N]
        mind = jnp.minimum(mind_ref[...], d)
        mind_ref[...] = mind
        # argmax with lowest-index tie-break.
        mx = jnp.max(mind, axis=-1, keepdims=True)
        hit = jnp.where(mind == mx, col, N)
        return jnp.min(hit, axis=-1).astype(jnp.int32)

    jax.lax.fori_loop(0, npoint, body, start_ref[:, 0].astype(jnp.int32))


@functools.partial(jax.custom_vjp, nondiff_argnums=(1,))
def fps_pallas(xyz: jax.Array, npoint: int, start_idx: jax.Array) -> jax.Array:
    """Greedy FPS indices, [B, npoint] int32 (kernel-resident loop)."""
    B, N, _ = xyz.shape
    order = pl.pallas_call(
        functools.partial(_fps_kernel, npoint=npoint),
        out_shape=jax.ShapeDtypeStruct((B, N), jnp.int32),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),  # start [B, 1]
            pl.BlockSpec(memory_space=pltpu.VMEM),  # xyz [B, N, 3]
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((B, N), jnp.float32)],
    )(
        start_idx.astype(jnp.int32)[:, None],
        jnp.swapaxes(xyz.astype(jnp.float32), 1, 2),  # [B, 3, N]
    )
    # Invert ordinals -> indices: selected positions sort first by their
    # selection step (stable sort keeps exact ordering).
    return jnp.argsort(order, axis=-1, stable=True)[:, :npoint].astype(jnp.int32)


def _fps_fwd(xyz, npoint, start_idx):
    return fps_pallas(xyz, npoint, start_idx), (xyz.shape, start_idx.shape)


def _fps_bwd(npoint, res, g):
    del g
    xshape, sshape = res
    return jnp.zeros(xshape, jnp.float32), jnp.zeros(sshape, jnp.int32)


fps_pallas.defvjp(_fps_fwd, _fps_bwd)
