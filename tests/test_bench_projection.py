"""Unit tests for bench.py's full-rate projection (pure math).

The projection is the portable-performance claim in the bench JSON
(PARITY.md "Full-rate projection" section): this run's measured
per-stage account re-priced at nominal v5e-1 rates, with the EdgeConv
dispatch re-decided by min() exactly as `mlsp-tpu calibrate` would on
that silicon. These tests pin its arithmetic and dispatch logic with
synthetic measurements so bench refactors can't silently change the
claim.
"""

import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from bench import TARGET, project_fullrate  # noqa: E402

# A plausible "this chip" measurement set (round-5 magnitudes):
# 71 ms flops bound, 184 ms sparse bound, 12 ms residual, 9.7 TFLOPS.
BASE = dict(
    flops_per_step=620e9,
    t_gather_bound=0.184,
    t_residual=0.012,
    g_rows_s=180e6,
    s_rows_s=55e6,
    tflops_bf16=9.7,
    B=32,
    N=1024,
    cal_b=8,
)


class TestProjectFullrate:
    def test_no_calibration_returns_empty(self):
        assert project_fullrate(**BASE, edge_cal=None) == {}
        assert project_fullrate(**BASE, edge_cal={}) == {}

    def test_moments_account_arithmetic(self):
        # A huge fused_ms forces the moments dispatch; its projected
        # step must equal the hand-computed three-term account.
        out = project_fullrate(**BASE, edge_cal={"fused_ms": 1e6})
        assert out["fullrate_dispatch_projected"] == "moments"
        throttle = BASE["tflops_bf16"] / 197.0
        expect = (BASE["flops_per_step"] / 197e12
                  + BASE["t_gather_bound"] * throttle
                  + BASE["t_residual"] * (600.0 / 819.0))
        assert out["fullrate_t_step_ms_projected"] == (
            pytest.approx(expect * 1e3, abs=0.005))
        assert out["fullrate_clouds_per_sec_projected"] == (
            pytest.approx(BASE["B"] / expect, abs=0.05))
        assert out["fullrate_vs_baseline_projected"] == (
            pytest.approx(BASE["B"] / expect / TARGET, abs=5e-4))

    def test_fused_account_arithmetic(self):
        # A tiny fused_ms forces the fused dispatch: 8 throttle- and
        # batch-scaled kernel instances plus only the transform-net's
        # remaining sparse rows.
        cal = {"fused_ms": 1.0}
        out = project_fullrate(**BASE, edge_cal=cal)
        assert out["fullrate_dispatch_projected"] == "fused"
        throttle = BASE["tflops_bf16"] / 197.0
        fused_layer = cal["fused_ms"] / 1e3 * (BASE["B"] / BASE["cal_b"])
        rows = 2 * BASE["B"] * BASE["N"] * 20
        expect = (BASE["flops_per_step"] / 197e12
                  + 8 * fused_layer * throttle
                  + (rows / BASE["g_rows_s"] + rows / BASE["s_rows_s"])
                  * throttle
                  + BASE["t_residual"] * (600.0 / 819.0))
        assert out["fullrate_t_step_ms_projected"] == (
            pytest.approx(expect * 1e3, abs=0.005))

    def test_dispatch_takes_the_min(self):
        # Sweep fused_ms across the crossover: projected step time must
        # always equal min(moments, fused) — monotone non-increasing as
        # fused gets cheaper, and capped by the moments account.
        moments_ms = project_fullrate(
            **BASE, edge_cal={"fused_ms": 1e6},
        )["fullrate_t_step_ms_projected"]
        prev = float("inf")
        for fused_ms in (1e3, 100.0, 30.0, 10.0, 3.0, 1.0, 0.3):
            out = project_fullrate(**BASE, edge_cal={"fused_ms": fused_ms})
            t = out["fullrate_t_step_ms_projected"]
            assert t <= moments_ms + 1e-9
            assert t <= prev + 1e-9
            prev = t

    def test_full_rate_chip_projects_itself(self):
        # On silicon already at nominal rates (throttle == 1) the
        # moments projection must reproduce the measured account —
        # the projection is identity-consistent, not a free speedup.
        args = dict(BASE, tflops_bf16=197.0)
        out = project_fullrate(**args, edge_cal={"fused_ms": 1e6})
        expect = (args["flops_per_step"] / 197e12 + args["t_gather_bound"]
                  + args["t_residual"] * (600.0 / 819.0))
        assert out["fullrate_t_step_ms_projected"] == (
            pytest.approx(expect * 1e3, abs=0.005))

    def test_throttled_chip_projects_faster_step(self):
        # Lower measured tflops (deeper throttle) must project a
        # FASTER full-rate step for the same measured bounds.
        slow = project_fullrate(**dict(BASE, tflops_bf16=5.0),
                                edge_cal={"fused_ms": 50.0})
        fast = project_fullrate(**dict(BASE, tflops_bf16=20.0),
                                edge_cal={"fused_ms": 50.0})
        assert (slow["fullrate_t_step_ms_projected"]
                < fast["fullrate_t_step_ms_projected"])
