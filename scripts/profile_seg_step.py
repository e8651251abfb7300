"""Roofline audit of the PointSegDA train step (the second headline
workload in bench.py).

Reports the XLA flop count, an HLO census of every gather/scatter with
its ROW count (the sparse-op cost model on this chip is rows/s — see
CLAUDE.md), and the resulting flops/sparse bounds next to the measured
step time. Round-3 finding: like the PointDA step, the seg step sits at
the XLA sparse floor — the B*N*k-row gathers and 9 scatters dominate,
and the row count is fixed by the architecture. Round-5 refinement: of
the ~21 census gathers only the 12 rank>=3 batched forms pay the
standalone row rate (the 9 flat re-gathers fuse — one per EdgeConvM
backward, matching the scatter count); the bound prices those 12 + the
scatters and then closes against the measured step (~0.98).

Run on the TPU chip: python scripts/profile_seg_step.py
"""

import json
import time

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

    # HLO census: one entry per gather/scatter with its row count
    # (shared with bench.py's seg account — utils/profiling.py). The
    # sparse bound prices only the COSTING gathers (rank>=3 batched
    # forms): the flat rank-2 EdgeConv-backward re-gathers fuse and
    # pricing them at the standalone row rate puts the "bound" ~20%
    # above the measured step (see profiling.costing_gather_rows).
    from mlsp_tpu.utils.profiling import costing_gather_rows, hlo_sparse_census

    g_rows_raw, s_rows, gathers, scatters = hlo_sparse_census(
        compiled.as_text())
    g_rows = costing_gather_rows(gathers)

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
        "gather_Mrows_raw": round(g_rows_raw / 1e6, 2),
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
