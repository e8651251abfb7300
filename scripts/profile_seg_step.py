"""Roofline audit of the PointSegDA train step (the second headline
workload in bench.py).

Reports the XLA flop count, an HLO census of every gather/scatter with
its ROW count (the sparse-op cost model on this chip is rows/s — see
CLAUDE.md), and the resulting flops/sparse bounds next to the measured
step time. Round-3 finding: like the PointDA step, the seg step sits at
the XLA sparse floor — ~21 gathers + 9 scatters of B*N*k rows dominate,
and the row count is fixed by the architecture.

Run on the TPU chip: python scripts/profile_seg_step.py
"""

import json
import re
import time
from collections import Counter

import jax
import jax.numpy as jnp
import numpy as np

from mlsp_tpu.utils.cache import enable as enable_cache

# measured chip rates (bench.py microbenches, re-measure when in doubt)
MATMUL_TFLOPS = 11.1
GATHER_ROWS_S = 92.8e6
SCATTER_ROWS_S = 48.6e6


def main():
    enable_cache()
    from mlsp_tpu.models import DGCNNSeg
    from mlsp_tpu.train import create_train_state, seg_steps
    from mlsp_tpu.utils.config import PointSegDAConfig

    Bs, Ss = 16, 8
    cfg = PointSegDAConfig(
        batch_size=Bs, synthetic=True, apply_PCM=True,
        Density_normal_viainput=True, scan_steps=Ss,
    ).resolved()
    Ns = cfg.num_points
    model = DGCNNSeg(num_classes=8, knn_backend="auto")
    state = create_train_state(
        model, jax.random.key(2), jnp.zeros((Bs, Ns, 3), jnp.float32),
        epochs=cfg.epochs, steps_per_epoch=100,
        heads=("seg", "defrec", "normal", "density"),
    )
    rng = np.random.default_rng(0)
    sx = jnp.asarray(rng.standard_normal((Bs, Ns, 3)), jnp.float32)
    sy = jnp.asarray(rng.integers(0, 8, (Bs, Ns)))
    tx = jnp.asarray(rng.standard_normal((Bs, Ns, 3)), jnp.float32)

    compiled = seg_steps.pointsegda_train_step.lower(
        state, sx, sy, tx, jax.random.key(1), cfg).compile()
    ca = compiled.cost_analysis()
    ca = ca[0] if isinstance(ca, list) else (ca or {})
    flops = float(ca.get("flops", 0.0))

    # HLO census: one entry per gather/scatter with its row count. For
    # scatter the COST rows are the update rows (operand 2), not the
    # output buffer shape.
    hlo = compiled.as_text()
    gathers, scatters = Counter(), Counter()
    for m in re.finditer(r"= \w+\[([\d,]+)\]\{[^}]*\} gather\(", hlo):
        gathers[m.group(1)] += 1
    # optimized HLO names operands without inline shapes: resolve the
    # updates operand (3rd) through a definition table
    defs = {m.group(1): m.group(2) for m in re.finditer(
        r"%([\w.-]+) = \w+\[([\d,]+)\]", hlo)}
    for m in re.finditer(r" scatter\(%([\w.-]+), %([\w.-]+), %([\w.-]+)\)",
                         hlo):
        scatters[defs.get(m.group(3), "?")] += 1

    def rows(shape):
        dims = [int(d) for d in shape.split(",")]
        return int(np.prod(dims[:-1])) if len(dims) > 1 else dims[0]

    g_rows = sum(rows(s) * c for s, c in gathers.items())
    s_rows = sum(rows(s) * c for s, c in scatters.items())

    # measured step time: scanned program + forced fetch
    sxs = jnp.asarray(rng.standard_normal((Ss, Bs, Ns, 3)), jnp.float32)
    sys_ = jnp.asarray(rng.integers(0, 8, (Ss, Bs, Ns)))
    txs = jnp.asarray(rng.standard_normal((Ss, Bs, Ns, 3)), jnp.float32)
    key = jax.random.key(3)
    state2, ms, _ = seg_steps.pointsegda_train_scan(
        state, sxs, sys_, txs, key, cfg)
    float(ms["total"][-1])  # compile + warm
    best = float("inf")
    for t in range(2):
        t0 = time.perf_counter()
        state2, ms, _ = seg_steps.pointsegda_train_scan(
            state2, sxs, sys_, txs, jax.random.fold_in(key, t), cfg)
        float(ms["total"][-1])
        best = min(best, time.perf_counter() - t0)
    t_step = best / Ss

    t_flops = flops / (MATMUL_TFLOPS * 1e12)
    t_sparse = g_rows / GATHER_ROWS_S + s_rows / SCATTER_ROWS_S
    print(json.dumps({
        "t_step_ms": round(t_step * 1e3, 1),
        "flops_GF": round(flops / 1e9, 1),
        "gather_ops": sum(gathers.values()),
        "gather_Mrows": round(g_rows / 1e6, 2),
        "scatter_ops": sum(scatters.values()),
        "scatter_Mrows": round(s_rows / 1e6, 2),
        "t_flops_bound_ms": round(t_flops * 1e3, 1),
        "t_sparse_bound_ms": round(t_sparse * 1e3, 1),
        "bound_sum_frac": round((t_flops + t_sparse) / t_step, 3),
        "gather_census": dict(gathers),
        "scatter_update_census": dict(scatters),
    }))


if __name__ == "__main__":
    main()
