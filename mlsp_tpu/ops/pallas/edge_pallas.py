"""Fused EdgeConv neighbourhood-moments Pallas kernel (gather/scatter-free).

`EdgeConvM` (models/dgcnn.py) consumes exactly four neighbourhood
statistics of the projected features u over each point's k nearest
neighbours: max, min, sum, sum-of-squares. The XLA lowering pays per
sparse ROW on this chip — a [B*N*k, C] gather forward (~175M rows/s)
and, worse, a scatter-add backward (~52-73M rows/s): ~16 ms per layer
instance, ~135 ms of the 248 ms step across the 8 instances.

This kernel never gathers or scatters. Per query tile it rebuilds the
kNN selection mask from MXU distance tiles in VMEM (same iterative
masked-argmin + lowest-index tie-break as `knn_pallas`, so the selected
SET matches `knn_indices` exactly), then:

  * sum / sum-of-squares are mask-matmuls against the database (MXU):
        s1 = M @ u,   s2 = M @ u**2
  * max / min are masked reduces over column blocks (VPU):
        mx = max_j u_j + (M-1)*BIG,   mn analogously
  * the custom_vjp backward is the transpose mask-matmuls
        du += M^T @ ds1 + 2*u * (M^T @ ds2)
    plus equal-share argmax/argmin credit (the same tie semantics as
    jnp.max's gradient), accumulated into a VMEM-resident [N, C] du
    block across query tiles — no XLA gather OR scatter anywhere.

Mosaic notes (this chip's toolchain): `lax.dynamic_slice` on VALUES is
unimplemented and unrolled python loops keep every iteration's
temporaries live (scoped-vmem OOM), so the mask is materialised
TRANSPOSED ([N, T], built directly — no transpose op) in a VMEM scratch
ref and every block loop is a `fori_loop` over `pl.ds` SUBLANE slices of
refs; lane-dim dynamic slicing never occurs.

The graph features xg receive no gradient (the selection is piecewise
constant in xg, matching `knn_indices`' integer outputs).

Replaces the reference's KNN_CUDA + torch gather + max path
(`PointDA/model_utils.py:9-42` + `conv_2d`) for the moments form.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_BIG = 1e30


def _row_dists(xq, xdb):
    qq = jnp.sum(xq * xq, axis=-1, keepdims=True)
    dd = jnp.sum(xdb * xdb, axis=-1, keepdims=True)
    inner = jax.lax.dot_general(
        xq, xdb,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,  # must match knn_pallas /
        # the XLA knn path bit-for-bit so fwd and bwd masks agree
    )
    return qq - 2.0 * inner + dd.T


def _fill_selT(xq, xdb, k, selT_ref):
    """Write the {0,1} TRANSPOSED kNN selection mask [N, T] to scratch.

    Same selection + tie-break as `knn_pallas` (argmin's first-match =
    lowest index). The transposed layout is built directly from the
    argmin indices so the block loops can take sublane `pl.ds` slices.
    """
    dist = _row_dists(xq, xdb)  # [T, N]
    T, N = dist.shape
    col = jax.lax.broadcasted_iota(jnp.int32, (T, N), 1)
    row_t = jax.lax.broadcasted_iota(jnp.int32, (N, T), 0)
    selT_ref[:] = jnp.zeros((N, T), jnp.float32)

    def body(_, d):
        a = jnp.argmin(d, axis=-1).astype(jnp.int32)  # [T]
        selT_ref[:] = jnp.where(row_t == a[None, :], 1.0, selT_ref[:])
        return jnp.where(col == a[:, None], jnp.inf, d)

    jax.lax.fori_loop(0, k, body, dist)


def _msum(selT, v):
    """(M @ v) via the transposed mask: [N, T]^T-contract [N, C] -> [T, C]."""
    return jax.lax.dot_general(
        selT, v, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )


def _mtsum(selT, v):
    """(M^T @ v): [N, T] @ [T, C] -> [N, C]."""
    return jax.lax.dot_general(
        selT, v, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )


def _fwd_kernel(xq_ref, xdb_ref, udb_ref, *refs, k, jb, want_moments):
    if want_moments:
        mx_ref, mn_ref, s1_ref, s2_ref, selT_ref = refs
    else:
        mx_ref, mn_ref, selT_ref = refs
    _fill_selT(xq_ref[0], xdb_ref[0], k, selT_ref)
    u = udb_ref[0]  # [N, C]
    N, C = u.shape
    T = mx_ref.shape[1]

    if want_moments:
        s1_ref[0] = _msum(selT_ref[:], u)
        s2_ref[0] = _msum(selT_ref[:], u * u)

    def body(j, carry):
        mx, mn = carry
        mT = selT_ref[pl.ds(j * jb, jb), :]  # [JB, T]
        ub = udb_ref[0, pl.ds(j * jb, jb), :]  # [JB, C]
        off = (mT[:, :, None] - 1.0) * _BIG  # 0 where selected, -BIG else
        mx = jnp.maximum(mx, jnp.max(ub[:, None, :] + off, axis=0))
        mn = jnp.minimum(mn, jnp.min(ub[:, None, :] - off, axis=0))
        return mx, mn

    mx, mn = jax.lax.fori_loop(
        0, N // jb, body,
        (jnp.full((T, C), -_BIG, jnp.float32),
         jnp.full((T, C), _BIG, jnp.float32)))
    mx_ref[0] = mx
    mn_ref[0] = mn


def _bwd_kernel(xq_ref, xdb_ref, udb_ref, mx_ref, mn_ref, dmx_ref, dmn_ref,
                *refs, k, jb, want_moments):
    if want_moments:
        ds1_ref, ds2_ref, du_ref, selT_ref = refs
    else:
        du_ref, selT_ref = refs
    i = pl.program_id(1)

    _fill_selT(xq_ref[0], xdb_ref[0], k, selT_ref)
    u = udb_ref[0]  # [N, C]
    N, C = u.shape

    @pl.when(i == 0)
    def _():
        du_ref[0] = jnp.zeros_like(du_ref[0])

    if want_moments:
        du_ref[0] += (_mtsum(selT_ref[:], ds1_ref[0])
                      + 2.0 * u * _mtsum(selT_ref[:], ds2_ref[0]))

    # Equal-share argmax/argmin credit (ties split evenly — the same
    # semantics as jnp.max's gradient, which the XLA path uses).
    mx, mn = mx_ref[0], mn_ref[0]  # [T, C]
    T = mx.shape[0]

    def blocks(j):
        mT = selT_ref[pl.ds(j * jb, jb), :][:, :, None]  # [JB, T, 1]
        ub = udb_ref[0, pl.ds(j * jb, jb), :][:, None, :]  # [JB, 1, C]
        eqx = jnp.where((ub == mx[None, :, :]) & (mT > 0), 1.0, 0.0)
        eqn = jnp.where((ub == mn[None, :, :]) & (mT > 0), 1.0, 0.0)
        return eqx, eqn  # [JB, T, C]

    def cnt_body(j, carry):
        cntx, cntn = carry
        eqx, eqn = blocks(j)
        return cntx + jnp.sum(eqx, axis=0), cntn + jnp.sum(eqn, axis=0)

    cntx, cntn = jax.lax.fori_loop(
        0, N // jb, cnt_body,
        (jnp.zeros((T, C), jnp.float32), jnp.zeros((T, C), jnp.float32)))
    wx = dmx_ref[0] / jnp.maximum(cntx, 1.0)
    wn = dmn_ref[0] / jnp.maximum(cntn, 1.0)

    def credit_body(j, _):
        eqx, eqn = blocks(j)
        credit = jnp.sum(eqx * wx[None, :, :] + eqn * wn[None, :, :], axis=1)
        du_ref[0, pl.ds(j * jb, jb), :] += credit
        return 0

    jax.lax.fori_loop(0, N // jb, credit_body, 0)


def _tiles(N, tile):
    if N % tile != 0:
        tile = min(tile, N)
        while N % tile != 0:
            tile //= 2
    return tile


def _col_block(N, C, tile, budget_bytes=2 * 1024 * 1024):
    """Column-block size for the [JB, TILE, C] masked-reduce blocks."""
    jb = max(8, budget_bytes // (tile * C * 4))
    jb = min(jb, N)
    while N % jb != 0:
        jb //= 2
    return max(jb, 1)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5))
def edge_moments(xg: jax.Array, u: jax.Array, k: int,
                 want_moments: bool = True, tile: int = 128,
                 interpret: bool = False):
    """Fused kNN neighbourhood statistics of `u` over the graph of `xg`.

    Args:
      xg: [B, N, Cg] f32 features the kNN graph is built on.
      u: [B, N, C] f32 features to aggregate (self included, like
        `knn_indices`).
      k: neighbourhood size.
      want_moments: also return the sum and sum-of-squares (train mode).

    Returns:
      (mx, mn, s1, s2) each [B, N, C] — max/min/sum/sum-of-squares over
      the k nearest neighbours — or (mx, mn) if not want_moments.
    """
    return _edge_moments_impl(xg, u, k, want_moments, tile, interpret)


def _edge_moments_impl(xg, u, k, want_moments, tile, interpret):
    B, N, Cg = xg.shape
    C = u.shape[-1]
    tile = _tiles(N, tile)
    jb = _col_block(N, C, tile)
    grid = (B, N // tile)
    xg = xg.astype(jnp.float32)
    u = u.astype(jnp.float32)

    n_out = 4 if want_moments else 2
    outs = pl.pallas_call(
        functools.partial(_fwd_kernel, k=k, jb=jb, want_moments=want_moments),
        out_shape=tuple(
            jax.ShapeDtypeStruct((B, N, C), jnp.float32) for _ in range(n_out)
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, tile, Cg), lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, N, Cg), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, N, C), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=tuple(
            pl.BlockSpec((1, tile, C), lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM)
            for _ in range(n_out)
        ),
        scratch_shapes=[pltpu.VMEM((N, tile), jnp.float32)],
        interpret=interpret,
    )(xg, xg, u)
    return outs


def _edge_moments_fwd(xg, u, k, want_moments, tile, interpret):
    outs = _edge_moments_impl(xg, u, k, want_moments, tile, interpret)
    # Residuals: mask is recomputed in the backward from xg (bit-identical
    # distance program), so only the inputs and the max/min values (for
    # argmax/argmin credit) are carried.
    return outs, (xg, u, outs[0], outs[1])


def _edge_moments_bwd(k, want_moments, tile, interpret, res, cots):
    xg, u, mx, mn = res
    if want_moments:
        dmx, dmn, ds1, ds2 = cots
    else:
        dmx, dmn = cots
    B, N, Cg = xg.shape
    C = u.shape[-1]
    tile_ = _tiles(N, tile)
    jb = _col_block(N, C, tile_)
    grid = (B, N // tile_)

    f32 = jnp.float32
    args = [xg.astype(f32), xg.astype(f32), u.astype(f32),
            mx.astype(f32), mn.astype(f32),
            dmx.astype(f32), dmn.astype(f32)]
    in_specs = [
        pl.BlockSpec((1, tile_, Cg), lambda b, i: (b, i, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, N, Cg), lambda b, i: (b, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, N, C), lambda b, i: (b, 0, 0),
                     memory_space=pltpu.VMEM),
    ] + [
        pl.BlockSpec((1, tile_, C), lambda b, i: (b, i, 0),
                     memory_space=pltpu.VMEM)
        for _ in range(4)
    ]
    if want_moments:
        args += [ds1.astype(f32), ds2.astype(f32)]
        in_specs += [
            pl.BlockSpec((1, tile_, C), lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM)
            for _ in range(2)
        ]

    du = pl.pallas_call(
        functools.partial(_bwd_kernel, k=k, jb=jb, want_moments=want_moments),
        out_shape=jax.ShapeDtypeStruct((B, N, C), jnp.float32),
        grid=grid,
        in_specs=in_specs,
        # The du block is revisited by every query tile of the same b:
        # TPU grids run sequentially, so it accumulates in VMEM and spills
        # to HBM once per b.
        out_specs=pl.BlockSpec((1, N, C), lambda b, i: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((N, tile_), jnp.float32)],
        interpret=interpret,
    )(*args)
    return jnp.zeros_like(xg), du.astype(u.dtype)


edge_moments.defvjp(_edge_moments_fwd, _edge_moments_bwd)
