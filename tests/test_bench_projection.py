"""Unit tests for bench.py's roofline helpers (pure math/text).

The full-rate projection is the portable-performance claim in the bench
JSON (PARITY.md "Full-rate projection" section): this run's measured
per-stage account re-priced at nominal v5e-1 rates, with the EdgeConv
dispatch re-decided by min() exactly as `mlsp-tpu calibrate` would on
that silicon. The HLO sparse census is the seg workload's row account
(the seg step has no hand-derived row count). These tests pin their
arithmetic, dispatch logic, and parsing with synthetic inputs so bench
refactors can't silently change the claims.
"""

import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from bench import TARGET, project_fullrate  # noqa: E402
from mlsp_tpu.utils.profiling import (costing_gather_rows,  # noqa: E402
                                      hlo_sparse_census, shape_rows)

# A plausible "this chip" measurement set (round-5 magnitudes):
# flagship rows (step_sparse_rows: 10/8 x B*N*k), ~9.7 TFLOPS.
B, N, K = 32, 1024, 20
BASE = dict(
    flops_per_step=620e9,
    gather_rows=10 * B * N * K,
    scatter_rows=8 * B * N * K,
    t_residual=0.012,
    g_rows_s=180e6,
    s_rows_s=55e6,
    tflops_bf16=9.7,
    batch=B,
    edge_rows=B * N * K,
)


def cals(fused_ms, n=8, cal_b=8):
    """n identical per-instance calibration records."""
    return [{"fused_ms": fused_ms, "cal_b": cal_b}] * n


def moments_expect(a):
    throttle = a["tflops_bf16"] / 197.0
    t_sparse = (a["gather_rows"] / a["g_rows_s"]
                + a["scatter_rows"] / a["s_rows_s"])
    return (a["flops_per_step"] / 197e12 + t_sparse * throttle
            + a["t_residual"] * (600.0 / 819.0))


class TestProjectFullrate:
    def test_no_calibration_returns_empty(self):
        assert project_fullrate(**BASE, edge_cals=None) == {}

    def test_moments_account_arithmetic(self):
        # A huge fused_ms forces the moments dispatch; its projected
        # step must equal the hand-computed three-term account.
        out = project_fullrate(**BASE, edge_cals=cals(1e6))
        assert out["fullrate_dispatch_projected"] == "moments"
        expect = moments_expect(BASE)
        assert out["fullrate_t_step_ms_projected"] == (
            pytest.approx(expect * 1e3, abs=0.005))
        assert out["fullrate_clouds_per_sec_projected"] == (
            pytest.approx(BASE["batch"] / expect, abs=0.05))
        assert out["fullrate_vs_baseline_projected"] == (
            pytest.approx(BASE["batch"] / expect / TARGET, abs=5e-4))

    def test_fused_account_arithmetic(self):
        # A tiny fused_ms forces the fused dispatch: 8 throttle- and
        # batch-scaled kernel instances plus only the remaining
        # non-EdgeConv rows (here 2*B*N*k gathers, 0 scatters).
        out = project_fullrate(**BASE, edge_cals=cals(1.0))
        assert out["fullrate_dispatch_projected"] == "fused"
        throttle = BASE["tflops_bf16"] / 197.0
        fused_layer = 1.0 / 1e3 * (BASE["batch"] / 8)
        rem_g = BASE["gather_rows"] - 8 * BASE["edge_rows"]  # 2*B*N*k
        rem_s = 0.0  # all scatters are EdgeConv backwards
        expect = (BASE["flops_per_step"] / 197e12
                  + 8 * fused_layer * throttle
                  + (rem_g / BASE["g_rows_s"] + rem_s / BASE["s_rows_s"])
                  * throttle
                  + BASE["t_residual"] * (600.0 / 819.0))
        assert out["fullrate_t_step_ms_projected"] == (
            pytest.approx(expect * 1e3, abs=0.005))

    def test_per_instance_pricing(self):
        # Mixed records (the wide layers cost more, round-3 data) must
        # be summed PER INSTANCE: equal to the same projection with one
        # synthetic record whose fused_ms is the per-instance mean.
        mixed = (cals(1.0, n=6) + cals(2.5, n=2))
        mean = cals((6 * 1.0 + 2 * 2.5) / 8, n=8)
        a = project_fullrate(**BASE, edge_cals=mixed)
        b = project_fullrate(**BASE, edge_cals=mean)
        assert a["fullrate_dispatch_projected"] == "fused"
        assert a["fullrate_t_step_ms_projected"] == (
            pytest.approx(b["fullrate_t_step_ms_projected"], abs=0.005))
        # and pricing the wide instances at the cheap record (the bug
        # this test pins) would understate the fused step
        cheap = project_fullrate(**BASE, edge_cals=cals(1.0))
        assert (cheap["fullrate_t_step_ms_projected"]
                < a["fullrate_t_step_ms_projected"])

    def test_dispatch_takes_the_min(self):
        # Sweep fused_ms across the crossover: projected step time must
        # always equal min(moments, fused) — monotone non-increasing as
        # fused gets cheaper, and capped by the moments account.
        moments_ms = project_fullrate(
            **BASE, edge_cals=cals(1e6),
        )["fullrate_t_step_ms_projected"]
        prev = float("inf")
        for fused_ms in (1e3, 100.0, 30.0, 10.0, 3.0, 1.0, 0.3):
            out = project_fullrate(**BASE, edge_cals=cals(fused_ms))
            t = out["fullrate_t_step_ms_projected"]
            assert t <= moments_ms + 1e-9
            assert t <= prev + 1e-9
            prev = t

    def test_full_rate_chip_projects_itself(self):
        # On silicon already at nominal rates (throttle == 1) the
        # moments projection must reproduce the measured account —
        # the projection is identity-consistent, not a free speedup.
        args = dict(BASE, tflops_bf16=197.0)
        out = project_fullrate(**args, edge_cals=cals(1e6))
        assert out["fullrate_t_step_ms_projected"] == (
            pytest.approx(moments_expect(args) * 1e3, abs=0.005))

    def test_throttled_chip_projects_faster_step(self):
        # Lower measured tflops (deeper throttle) must project a
        # FASTER full-rate step for the same measured rows/rates.
        slow = project_fullrate(**dict(BASE, tflops_bf16=5.0),
                                edge_cals=cals(50.0))
        fast = project_fullrate(**dict(BASE, tflops_bf16=20.0),
                                edge_cals=cals(50.0))
        assert (slow["fullrate_t_step_ms_projected"]
                < fast["fullrate_t_step_ms_projected"])

    def test_no_fused_path_projects_moments_only(self):
        # edge_cals=[] (the seg model's LinearEdgeBlock has no fused
        # alternative): the projection must be the moments account even
        # when a hypothetical fused record would have won, and the
        # dispatch must say so.
        args = dict(BASE, batch=16,
                    gather_rows=12 * 16 * 2048 * 20,
                    scatter_rows=9 * 16 * 2048 * 20,
                    edge_rows=16 * 2048 * 20)
        out = project_fullrate(**args, edge_cals=[], target=None,
                               prefix="seg_fullrate")
        assert set(out) == {"seg_fullrate_clouds_per_sec_projected",
                            "seg_fullrate_dispatch_projected",
                            "seg_fullrate_t_step_ms_projected"}
        assert out["seg_fullrate_dispatch_projected"] == "moments"
        assert out["seg_fullrate_t_step_ms_projected"] == (
            pytest.approx(moments_expect(args) * 1e3, abs=0.005))


SYNTH_HLO = """
ENTRY %main {
  %p0 = f32[32,1024,64]{2,1,0} parameter(0)
  %g.1 = f32[32,1024,20,64]{3,2,1,0} gather(%p0, %i0), offset_dims={3}
  %g.2 = f32[655360,3]{1,0} gather(%p1, %i1), offset_dims={1}
  %upd.3 = f32[32,1024,20,64]{3,2,1,0} add(%g.1, %g.1)
  %sc.4 = f32[32,1024,64]{2,1,0} scatter(%p0, %i0, %upd.3), to_apply=%add
  %sc.5 = f32[32,1024,64]{2,1,0} scatter(%p0, %i0, %mystery), to_apply=%add
}
"""


class TestHloSparseCensus:
    def test_shape_rows(self):
        assert shape_rows("32,1024,20,64") == 32 * 1024 * 20
        assert shape_rows("655360,3") == 655360
        assert shape_rows("128") == 128
        assert shape_rows("?") == 0

    def test_census_counts_and_rows(self):
        g_rows, s_rows, gathers, scatters = hlo_sparse_census(SYNTH_HLO)
        # gather cost rows = OUTPUT rows
        assert gathers == {"32,1024,20,64": 1, "655360,3": 1}
        assert g_rows == 32 * 1024 * 20 + 655360
        # scatter cost rows = UPDATES-operand rows, resolved through the
        # definition table; unresolvable operands surface as "?" with 0
        # rows rather than crashing or silently vanishing
        assert scatters == {"32,1024,20,64": 1, "?": 1}
        assert s_rows == 32 * 1024 * 20

    def test_empty_program(self):
        assert hlo_sparse_census("ENTRY %m { ROOT %c = f32[] constant(0) }"
                                 ) == (0, 0, {}, {})

    def test_variadic_scatter_counts_every_update(self):
        # XLA can merge scatters sharing indices into one variadic
        # scatter(%op0, %op1, %idx, %upd0, %upd1); each updates operand
        # must be censused (rows cost the same sort+segmented-add),
        # not silently dropped.
        hlo = """
ENTRY %main {
  %p0 = f32[32,1024,64]{2,1,0} parameter(0)
  %u.0 = f32[32,1024,20,64]{3,2,1,0} add(%p0, %p0)
  %u.1 = f32[655360,3]{1,0} add(%p1, %p1)
  %sc = (f32[32,1024,64], f32[32,1024,3]) scatter(%p0, %p1, %i, %u.0, %u.1), to_apply=%add2
}
"""
        g_rows, s_rows, _, scatters = hlo_sparse_census(hlo)
        assert scatters == {"32,1024,20,64": 1, "655360,3": 1}
        assert s_rows == 32 * 1024 * 20 + 655360
        assert g_rows == 0

    def test_costing_rows_filter_drops_flat_gathers(self):
        # The flat rank-2 [B*N*k, C] EdgeConv-backward re-gathers fuse
        # and must not be priced at the standalone row rate; the
        # batched rank>=3 forms must survive the filter.
        _, _, gathers, _ = hlo_sparse_census(SYNTH_HLO)
        assert costing_gather_rows(gathers) == 32 * 1024 * 20
        # the raw census keeps both (transparency)
        assert sum(gathers.values()) == 2
