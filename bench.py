"""Headline benchmark: full MLSP train-step throughput on one TPU chip,
with a measured roofline account of where the time goes.

Workload (BASELINE.md): DGCNN k=20, 1024 points, batch 32, the full
paper recipe — PCM mixup (on-device FPS), DefRec deformation, on-device
normal + cardinality ground-truth generation, all SSL heads, one
optimizer update per iteration. The backbone computes in f32 (full bf16
measurably degrades DGCNN convergence — CLAUDE.md) and the per-point
heads in bf16 — the production default since the round-3 multi-seed A/B
(3 seeds x 30 epochs) showed head-bf16 matches f32 convergence (perf-
neutral on THIS chip — f32 matmul runs at bf16 rate and SplitDense
already removed the head traffic — but cheaper on full-rate silicon).
Set MLSP_BENCH_HEAD_F32=1 to bench full-f32.

Measurement protocol: S train steps are executed as ONE device program
(`lax.scan`) and timed with a forced value fetch at the end. Through the
remote-TPU relay in this environment, `block_until_ready` on dispatched
calls returns before execution finishes, so naive per-step timing
under-reports by orders of magnitude; the scan+fetch protocol measures
true device throughput.

Roofline: the JSON line also reports
  * flops_per_step        — XLA cost analysis of the compiled program,
  * matmul_tflops_f32     — achieved big-matmul throughput (microbench),
  * gather/scatter_Mrows_s — achieved kNN gather / scatter-add ROW rates
                            (the binding model: sparse ops here cost per
                            row, ~flat in channel width up to C~256),
  * t_flops_bound_ms      — flops / achieved matmul throughput,
  * t_sparse_bound_ms     — the step's analytic gather+scatter rows at
                            the achieved row rates,
  * roofline_frac         — max(bound) / measured step time: how close
                            the program is to the binding resource limit
                            on THIS chip (round-2 measured: ~9.7 TFLOPS
                            matmul with f32 at bf16 rate, ~46 GB/s
                            gather, ~140 GB/s scatter/stream).

The line also carries `eval_clouds_per_sec`: serving-mode (train=False)
classification throughput of the same model, measured with the same
scan+fetch protocol — the deploy-time number (no moment gathers, no
backward scatter) — and `seg_clouds_per_sec`: the second headline
workload, a full PointSegDA train step (dgcnn_seg @ 2048 pts, source
seg CE + PCM-seg + target DefRec/Normal/Density viainput).

Baseline for `vs_baseline`: the repo publishes no numbers (BASELINE.md);
the north star is 5x a V100-era PyTorch estimate of 640 clouds/sec, i.e.
3200 clouds/sec/chip on production silicon.

Prints exactly one JSON line.
"""

import json
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

V100_ESTIMATE_CLOUDS_PER_SEC = 640.0
TARGET = 5.0 * V100_ESTIMATE_CLOUDS_PER_SEC


from mlsp_tpu.utils.timing import timed_fetch as _timed  # noqa: E402


def measure_matmul_tflops(dtype, M=2048, S=16) -> float:
    """Achieved dense-matmul throughput via a scanned chain."""
    x = jnp.asarray(np.random.default_rng(0).standard_normal((M, M)), dtype)
    w = jnp.asarray(np.random.default_rng(1).standard_normal((M, M)), dtype)

    @jax.jit
    def run(x, w):
        def body(c, _):
            c = jnp.dot(c, w, preferred_element_type=c.dtype)
            c = c / jnp.float32(M).astype(c.dtype)  # keep magnitudes sane
            return c, ()

        c, _ = jax.lax.scan(body, x, (), length=S)
        return jnp.sum(c.astype(jnp.float32))

    _timed(run, x, w, trials=1)  # compile + warm
    dt = _timed(run, x, w)
    return S * 2 * M**3 / dt / 1e12


def measure_gather_scatter(B=32, N=1024, k=20, C=128, S=16):
    """Achieved kNN-neighbour gather and scatter-add (gather backward)
    rates, with REAL kNN indices (neighbour locality matters: profile-
    measured row rate with kNN indices is ~2x a uniform-random gather).

    TPU gather/scatter here are ROW-RATE bound: per the per-op profile,
    a [B*N*k]-row gather costs ~the same for C=3 and C=128 (~175M
    rows/s), with bandwidth only surfacing beyond C~256. Returns
    ((gather_rows_per_s, gather_GBps), (scatter_rows_per_s, scatter_GBps)).
    """
    rng = np.random.default_rng(0)
    pts = jnp.asarray(rng.standard_normal((B, N, 3)), jnp.float32)
    x = jnp.asarray(rng.standard_normal((B, N, C)), jnp.float32)

    from mlsp_tpu.ops.knn import knn_gather, knn_indices

    idx = jax.jit(lambda p: knn_indices(p, k))(pts)
    rows = B * N * k
    bytes_moved = rows * C * 4

    @jax.jit
    def fwd(x, idx):
        def body(c, _):
            g = knn_gather(x + c, idx)  # [B, N, k, C]
            return jnp.max(g) * 1e-9, ()

        c, _ = jax.lax.scan(body, jnp.float32(0.0), (), length=S)
        return c

    # Random cotangent: with a constant (all-ones) cotangent XLA folds
    # the scatter-add and reports a ~4x optimistic rate (measured: ones
    # ~290M rows/s vs random ~52-73M rows/s, the rate real backward
    # passes actually see). Passed as an argument — a closed-over
    # constant would be baked into the HLO and overflow the remote
    # compiler's request limit.
    cot = jnp.asarray(rng.standard_normal((B, N, k, C)), jnp.float32)
    grad_inner = jax.grad(
        lambda x, idx, cot: jnp.sum(knn_gather(x, idx) * cot))

    @jax.jit
    def bwd(x, idx, cot):
        def body(c, _):
            # cot + c varies per iteration: the scatter operand must not
            # be loop-invariant or XLA hoists the scatter out of the
            # scan and the measurement amortizes one scatter over S.
            g = grad_inner(x, idx, cot + c)  # scatter-add to [B, N, C]
            return jnp.max(g) * 1e-9, ()

        c, _ = jax.lax.scan(body, jnp.float32(0.0), (), length=S)
        return c

    _timed(fwd, x, idx, trials=1)
    dt_g = _timed(fwd, x, idx) / S
    _timed(bwd, x, idx, cot, trials=1)
    dt_s = _timed(bwd, x, idx, cot) / S
    return (rows / dt_g, bytes_moved / dt_g / 1e9), (rows / dt_s, bytes_moved / dt_s / 1e9)


def step_sparse_rows(B, N, k, near):
    """Sparse-op row counts of one paper-recipe train step.

    Two differentiated DGCNN forwards (PCM-mixed cls + deformed
    multi-head): each does 5 neighbour gathers (raw-coord edge features
    for the transform net + one per EdgeConvM layer) and the backward
    scatter-adds one [B*N*k]-row cotangent per EdgeConvM layer.
    estimate_normals is gather-free (fused Pallas moments kernel) and
    kNN selection runs in the Pallas kernel — both excluded.
    """
    del near
    gather_rows = 2 * 5 * B * N * k
    scatter_rows = 2 * 4 * B * N * k
    return gather_rows, scatter_rows


def project_fullrate(*, flops_per_step, gather_rows, scatter_rows,
                     t_residual, g_rows_s, s_rows_s, tflops_bf16, batch,
                     edge_rows, edge_cals,
                     target=TARGET, prefix="fullrate"):
    """Whole-step full-rate projection (nominal v5e-1: 197 bf16 TFLOPS
    MXU, ~4T op/s VPU, 819 GB/s HBM) under the auto dispatch: both
    EdgeConv cores are projected from THIS run's measured per-stage
    account and the dispatch takes the min, exactly as chipcal's
    measured A/B would on that silicon. Assumptions (stated in
    PARITY.md, which separates this portable claim from this throttled
    chip):
      * dense flops at the nominal MXU rate (bf16-dominant),
      * non-MXU work (sparse rows, the fused kernel's VPU reductions)
        scaled by the measured-vs-nominal throttle ratio — the VPU is
        throttled in the same class as the MXU (round-3
        perf_edge_micro); fused per-instance cost is linear in B
        (each calibration record carries the B it was measured at),
      * the measured residual scaled by the HBM headroom (streaming
        already runs ~600 of 819 GB/s here).
    Uniform throttle scaling is ratio-preserving, so this projection is
    conservative for the fused path (its nominal-VPU roofline is
    ~1-2 ms/layer, round 3) — the min() keeps the claim honest.

    Generalised over workloads: ``gather_rows``/``scatter_rows`` are the
    step's total sparse rows. ``edge_cals`` is one calibration record
    PER FUSABLE EdgeConvM instance — ``{"fused_ms", "cal_b"}``, resolved
    by the caller at each instance's own gather width (the fused cost is
    shape-dependent: round 3 measured 22.5 ms at C=64 vs 32 ms at C=256
    fwd+bwd, so pricing every instance at one shape's record would skew
    the crossover). The fused dispatch eliminates each instance's
    ``edge_rows`` (= B*N*k) gather rows plus its backward scatter
    (whichever of the two actually exist — remainders clamp at 0).
    ``edge_cals=[]`` means the workload has NO fused alternative (the
    seg model's LinearEdgeBlock is plain gather+max — no Pallas
    edge-moments path exists for it), so only the moments account is
    projected and the dispatch is reported as such; ``edge_cals=None``
    means calibration was unavailable -> no projection at all.
    ``prefix`` names the emitted JSON fields (``fullrate_*`` /
    ``seg_fullrate_*``).

    Pure function of this run's measurements; unit-tested in
    tests/test_bench_projection.py.
    """
    if edge_cals is None:
        return {}
    throttle = tflops_bf16 / 197.0
    t_flops_fr = flops_per_step / 197e12
    t_resid_fr = t_residual * (600.0 / 819.0)
    # moments dispatch: every sparse row survives, at throttle-scaled
    # rates (XLA scatter = sort + segmented add: VPU work)
    t_sparse = gather_rows / g_rows_s + scatter_rows / s_rows_s
    t_moments = t_flops_fr + t_sparse * throttle + t_resid_fr
    if edge_cals:
        # fused dispatch: each EdgeConvM instance's gather + backward
        # scatter rows vanish into a fused kernel instance priced at its
        # own shape's record; only the non-EdgeConv rows (transform-net
        # coord gathers, FPS/chamfer ops) remain
        t_fused_layers = sum(
            cal["fused_ms"] / 1e3 * (batch / cal["cal_b"]) * throttle
            for cal in edge_cals)
        n_edge_layers = len(edge_cals)
        rem_g = max(0.0, gather_rows - n_edge_layers * edge_rows)
        rem_s = max(0.0, scatter_rows - n_edge_layers * edge_rows)
        rem_sparse_s = (rem_g / g_rows_s + rem_s / s_rows_s) * throttle
        t_fused = t_flops_fr + t_fused_layers + rem_sparse_s + t_resid_fr
    else:
        t_fused = float("inf")  # no fused path exists for this workload
    # the auto dispatch on that silicon would measure and take the min
    t_proj = min(t_moments, t_fused)
    out = {
        f"{prefix}_clouds_per_sec_projected": round(batch / t_proj, 1),
        f"{prefix}_dispatch_projected": (
            "moments" if t_moments <= t_fused else "fused"),
        f"{prefix}_t_step_ms_projected": round(t_proj * 1e3, 2),
    }
    if target is not None:  # the seg workload has no published north star
        out[f"{prefix}_vs_baseline_projected"] = round(
            batch / t_proj / target, 3)
    return out


def main() -> None:
    from mlsp_tpu.utils.cache import enable as _enable_cache

    _enable_cache()
    from mlsp_tpu.models import DGCNN
    from mlsp_tpu.train import create_train_state, steps
    from mlsp_tpu.utils.config import PointDAConfig

    B, N, S = 32, 1024, 16
    cfg = PointDAConfig(
        batch_size=B, num_points=N, synthetic=True,
        Density_normal_viainput=True, Normal_ondef=True, Density_ondef=True,
        radius=0.135,
    )
    head_bf16 = os.environ.get("MLSP_BENCH_HEAD_F32", "") != "1"
    from mlsp_tpu.utils import chipcal

    cal_records = chipcal.edge_calibration()  # per-shape A/B, cached per chip
    edge_cal = cal_records.get("n1024_c64", {})  # flagship layer shape
    edge_cal_seg = cal_records.get("n2048_c64", {})  # seg shape class

    def instance_cal(n, c):
        """Calibration record for ONE EdgeConvM instance, resolved at
        its own gather width (= output width; nearest measured shape
        class) — the fused cost is shape-dependent, so the full-rate
        projection prices each instance by its own record."""
        key = chipcal.nearest_shape_key(n, c, cal_records)
        return {"fused_ms": cal_records[key]["fused_ms"],
                "cal_b": chipcal.SHAPES.get(key, {"B": 8})["B"]}

    model = DGCNN(
        num_classes=10, k=20, knn_backend="auto",
        head_dtype=jnp.bfloat16 if head_bf16 else None,
    )  # backbone f32: full bf16 degrades convergence (kNN graphs from
    # rounded features); per-point heads have no graph dependency.
    # edge_impl defaults to "auto" -> the calibrated winner above.
    sample = jnp.zeros((B, N, 3), jnp.float32)
    state = create_train_state(
        model, jax.random.key(0), sample, epochs=150, steps_per_epoch=100,
        heads=("defrec", "normal", "scan", "density"),
    )

    rng = np.random.default_rng(0)
    sxs = jnp.asarray(rng.standard_normal((S, B, N, 3)), jnp.float32)
    sys_ = jnp.asarray(rng.integers(0, 10, (S, B)))
    txs = jnp.asarray(rng.standard_normal((S, B, N, 3)), jnp.float32)
    key = jax.random.key(1)

    # XLA flop count of ONE train step. NB: cost_analysis counts a scan
    # body once (not x trip-count), so lower the single-step program.
    ca = steps.pointda_train_step.lower(
        state, sxs[0], sys_[0], txs[0], key, cfg
    ).compile().cost_analysis()
    ca = ca[0] if isinstance(ca, list) else (ca or {})
    flops_per_step = float(ca.get("flops", 0.0))

    state, ms = steps.pointda_train_scan(state, sxs, sys_, txs, key, cfg)
    float(ms["total"][-1])

    best_dt = float("inf")
    for trial in range(3):
        t0 = time.perf_counter()
        state, ms = steps.pointda_train_scan(
            state, sxs, sys_, txs, jax.random.fold_in(key, trial), cfg
        )
        float(ms["total"][-1])  # forced fetch = true completion
        best_dt = min(best_dt, time.perf_counter() - t0)
    t_step = best_dt / S

    # Serving/inference throughput: scanned eval forward (cls logits).
    # Eval mode skips EdgeConvM's moment gathers and has no backward
    # scatter, so this is the deploy-time classification rate. Params
    # are arguments, not closure constants (closed-over arrays get baked
    # into the HLO and overflow the remote compiler's request limit).
    @jax.jit
    def eval_run(p, bs, xs):
        def body(c, x):
            o = model.apply({"params": p, "batch_stats": bs}, x, train=False)
            return c + jnp.sum(o["cls"].astype(jnp.float32)), ()

        c, _ = jax.lax.scan(body, jnp.float32(0.0), xs)
        return c

    float(eval_run(state.params, state.batch_stats, txs))  # compile + warm
    t_eval = _timed(eval_run, state.params, state.batch_stats, txs) / S

    # Second headline workload: the PointSegDA train step (DGCNN_DefRec
    # seg backbone, 2048 pts — `PointSegDA/trainer.py:282-437`'s inner
    # loop: source seg CE + PCM-seg mixup + target DefRec/Normal/Density
    # viainput), same scan+fetch protocol.
    from mlsp_tpu.models import DGCNNSeg
    from mlsp_tpu.train import seg_steps
    from mlsp_tpu.utils.config import PointSegDAConfig

    Bs, Ss = 16, 8
    seg_cfg = PointSegDAConfig(
        batch_size=Bs, synthetic=True, apply_PCM=True,
        Density_normal_viainput=True, scan_steps=Ss,
    ).resolved()
    Ns = seg_cfg.num_points
    seg_model = DGCNNSeg(num_classes=8, knn_backend="auto")
    seg_state = create_train_state(
        seg_model, jax.random.key(2), jnp.zeros((Bs, Ns, 3), jnp.float32),
        epochs=seg_cfg.epochs, steps_per_epoch=100,
        heads=("seg", "defrec", "normal", "density"),
    )
    seg_sxs = jnp.asarray(rng.standard_normal((Ss, Bs, Ns, 3)), jnp.float32)
    seg_sys = jnp.asarray(rng.integers(0, 8, (Ss, Bs, Ns)))
    seg_txs = jnp.asarray(rng.standard_normal((Ss, Bs, Ns, 3)), jnp.float32)
    # seg single-step program: XLA flop count + HLO sparse census (the
    # seg step has no hand-derived row account like step_sparse_rows;
    # the census measures the ACTUAL lowered gather/scatter rows —
    # round-3 audit: ~21 gathers + 9 scatters of Bs*Ns*k rows each).
    from mlsp_tpu.utils.profiling import (costing_gather_rows,
                                          hlo_sparse_census, shape_rows)

    seg_compiled = seg_steps.pointsegda_train_step.lower(
        seg_state, seg_sxs[0], seg_sys[0], seg_txs[0], key, seg_cfg
    ).compile()
    seg_ca = seg_compiled.cost_analysis()
    seg_ca = seg_ca[0] if isinstance(seg_ca, list) else (seg_ca or {})
    seg_flops = float(seg_ca.get("flops", 0.0))
    _, seg_s_rows, seg_gather_census, seg_scatter_census = hlo_sparse_census(
        seg_compiled.as_text())
    # costing rows only: the flat rank-2 EdgeConv-backward re-gathers
    # fuse and do not pay the standalone row rate (see
    # profiling.costing_gather_rows — raw census over-prices by ~20%)
    seg_g_rows = costing_gather_rows(seg_gather_census)
    # each LinearEdgeBlock backward = one scatter of Bs*Ns*k update
    # rows (the adjoint of its gather+max); counted as a diagnostic —
    # the seg projection has no fused alternative to eliminate them
    seg_edge_rows = Bs * Ns * seg_model.k
    n_edge_seg = sum(c for s, c in seg_scatter_census.items()
                     if shape_rows(s) == seg_edge_rows)

    seg_state, seg_ms, _ = seg_steps.pointsegda_train_scan(
        seg_state, seg_sxs, seg_sys, seg_txs, key, seg_cfg)
    float(seg_ms["total"][-1])  # compile + warm
    seg_dt = float("inf")
    for trial in range(2):
        t0 = time.perf_counter()
        seg_state, seg_ms, _ = seg_steps.pointsegda_train_scan(
            seg_state, seg_sxs, seg_sys, seg_txs,
            jax.random.fold_in(key, 10 + trial), seg_cfg)
        float(seg_ms["total"][-1])
        seg_dt = min(seg_dt, time.perf_counter() - t0)
    t_seg = seg_dt / Ss

    # Roofline context: achieved primitive peaks on this chip, now.
    tflops_f32 = measure_matmul_tflops(jnp.float32)
    tflops_bf16 = measure_matmul_tflops(jnp.bfloat16)
    (g_rows_s, gather_gbps), (s_rows_s, scatter_gbps) = measure_gather_scatter(
        B=B, N=N, k=20
    )

    g_rows, s_rows = step_sparse_rows(B, N, k=20, near=cfg.near)
    t_gather_bound = g_rows / g_rows_s + s_rows / s_rows_s
    # Bound against the f32 peak even in head-bf16 mode: the backbone
    # and distance matmuls stay f32, so dividing ALL flops by the bf16
    # rate would understate the bound (moot on this chip, f32 ~= bf16).
    t_flops_bound = flops_per_step / (tflops_f32 * 1e12)
    # max() assumes perfect MXU/HBM overlap; the serial sum is the
    # floor when the phases can't overlap (one core drives both here) —
    # the truth is in between, so report both fractions.
    roofline_frac = max(t_flops_bound, t_gather_bound) / t_step
    bound_sum_frac = (t_flops_bound + t_gather_bound) / t_step
    # Self-consistent residual, from THIS run: whatever the two measured
    # bounds don't account for (layout/copy/transpose traffic around the
    # sparse ops, per the round-4 trace census in
    # scripts/attrib_step_trace.py). flops + sparse + residual == t_step
    # by construction; clamped at 0 when microbench jitter puts the
    # bounds above the measured step.
    t_residual = max(0.0, t_step - t_flops_bound - t_gather_bound)

    # one record per EdgeConvM instance at its own gather width: two
    # differentiated DGCNN forwards x layer output widths 64/64/128/256
    flag_inst_cals = ([instance_cal(N, c)
                       for _ in range(2) for c in (64, 64, 128, 256)]
                      if cal_records else None)
    projection = project_fullrate(
        flops_per_step=flops_per_step, gather_rows=g_rows,
        scatter_rows=s_rows, t_residual=t_residual, g_rows_s=g_rows_s,
        s_rows_s=s_rows_s, tflops_bf16=tflops_bf16, batch=B,
        edge_rows=B * N * 20, edge_cals=flag_inst_cals)

    # seg-step roofline account: costing census rows priced at rates
    # microbenched AT THE SEG SHAPE (B=16, N=2048, C=64; measured
    # within ~2% of the flagship-shape rates — the rows/s model really
    # is ~flat — but shape-matched is the honest default).
    (seg_g_rows_s, _), (seg_s_rows_s, _) = measure_gather_scatter(
        B=Bs, N=Ns, k=seg_model.k, C=64)
    t_seg_flops_bound = seg_flops / (tflops_f32 * 1e12)
    t_seg_sparse_bound = (seg_g_rows / seg_g_rows_s
                          + seg_s_rows / seg_s_rows_s)
    t_seg_residual = max(0.0, t_seg - t_seg_flops_bound - t_seg_sparse_bound)
    # edge_cals=[]: DGCNNSeg's LinearEdgeBlock is plain gather+max — no
    # fused Pallas alternative exists for it, so the seg projection is
    # the moments account only (projecting a fused dispatch no buildable
    # configuration can reach would overstate the portable claim).
    seg_projection = project_fullrate(
        flops_per_step=seg_flops, gather_rows=seg_g_rows,
        scatter_rows=seg_s_rows, t_residual=t_seg_residual,
        g_rows_s=seg_g_rows_s, s_rows_s=seg_s_rows_s,
        tflops_bf16=tflops_bf16, batch=Bs, edge_rows=seg_edge_rows,
        edge_cals=[], target=None, prefix="seg_fullrate")
    # dict-literal duplicate keys overwrite silently — make a prefix
    # mistake loud instead (it once halved the flagship projection)
    assert not set(projection) & set(seg_projection), (
        "projection field collision", projection, seg_projection)

    clouds_per_sec = B / t_step
    print(json.dumps({
        "metric": "clouds/sec/chip (DGCNN k=20, 1024 pts, full MLSP train step)",
        "value": round(clouds_per_sec, 1),
        "unit": "clouds/sec/chip",
        "vs_baseline": round(clouds_per_sec / TARGET, 3),
        "t_step_ms": round(t_step * 1e3, 2),
        "flops_per_step": round(flops_per_step / 1e9, 1),
        "flops_unit": "GFLOP",
        "matmul_tflops_f32": round(tflops_f32, 3),
        "matmul_tflops_bf16": round(tflops_bf16, 3),
        "gather_Mrows_s": round(g_rows_s / 1e6, 1),
        "scatter_Mrows_s": round(s_rows_s / 1e6, 1),
        "gather_GBps": round(gather_gbps, 2),
        "scatter_GBps": round(scatter_gbps, 2),
        "t_flops_bound_ms": round(t_flops_bound * 1e3, 2),
        "t_sparse_bound_ms": round(t_gather_bound * 1e3, 2),
        "roofline_frac": round(roofline_frac, 3),
        "bound_sum_frac": round(bound_sum_frac, 3),
        # Residual measured from THIS run (t_step - flops - sparse,
        # clamped at 0): the layout/copy/transpose long tail, per the
        # trace census in scripts/attrib_step_trace.py. The account
        # flops + sparse + residual == max(t_step, bounds) closes by
        # construction.
        "t_residual_ms": round(t_residual * 1e3, 2),
        **projection,
        "eval_clouds_per_sec": round(B / t_eval, 1),
        "t_eval_ms": round(t_eval * 1e3, 2),
        "seg_clouds_per_sec": round(Bs / t_seg, 1),
        "t_seg_step_ms": round(t_seg * 1e3, 2),
        # seg account: census-derived rows (ACTUAL lowered HLO), same
        # same-run closure property as the flagship account
        "seg_flops_per_step": round(seg_flops / 1e9, 1),
        "seg_gather_Mrows": round(seg_g_rows / 1e6, 2),
        "seg_scatter_Mrows": round(seg_s_rows / 1e6, 2),
        "seg_gather_Mrows_s": round(seg_g_rows_s / 1e6, 1),
        "seg_scatter_Mrows_s": round(seg_s_rows_s / 1e6, 1),
        "seg_edge_layers": n_edge_seg,
        "t_seg_flops_bound_ms": round(t_seg_flops_bound * 1e3, 2),
        "t_seg_sparse_bound_ms": round(t_seg_sparse_bound * 1e3, 2),
        "seg_bound_sum_frac": round(
            (t_seg_flops_bound + t_seg_sparse_bound) / t_seg, 3),
        "t_seg_residual_ms": round(t_seg_residual * 1e3, 2),
        **seg_projection,
        "head_dtype": "bf16" if head_bf16 else "f32",
        # chip-calibrated EdgeConv dispatch (utils/chipcal.py): the
        # measured per-layer A/B and the winner "auto" resolved to.
        # The projection scales the fused kernel's time by this chip's
        # matmul throttle vs nominal v5e (197 bf16 TFLOPS) — the VPU is
        # throttled in the same class (round-3 perf_edge_micro) — i.e.
        # the fused path's expected per-layer time on full-rate silicon.
        "edge_impl": (edge_cal.get("winner", "moments")
                      if model.edge_impl == "auto" else model.edge_impl),
        "edge_moments_ms": edge_cal.get("moments_ms"),
        "edge_fused_ms": edge_cal.get("fused_ms"),
        "edge_fused_fullrate_ms_projected": (
            round(edge_cal["fused_ms"] * tflops_bf16 / 197.0, 3)
            if edge_cal else None),
        # the chipcal A/B record at the seg SHAPE CLASS (N=2048) —
        # informational only: DGCNNSeg's LinearEdgeBlock has no fused
        # path, so the seg step always runs the gather+max core and the
        # seg projection above is moments-only
        "seg_shape_edge_ab_winner": edge_cal_seg.get("winner"),
        "seg_shape_edge_moments_ms": edge_cal_seg.get("moments_ms"),
        "seg_shape_edge_fused_ms": edge_cal_seg.get("fused_ms"),
    }))


if __name__ == "__main__":
    main()
