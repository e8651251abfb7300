"""Chip-calibrated EdgeConv dispatch (`utils/chipcal.py`).

The dispatch must (a) honor cached PER-SHAPE verdicts for this device
kind — including a mixed cache where different layer shapes resolve to
different implementations, (b) adopt legacy single-shape cache records,
(c) fall back to the safe XLA path inside a trace with no calibration
(with a warning), and (d) drive BOTH DGCNN branches from the resolved
value — the fused and per-row paths share one param tree, so the flip
is checkpoint-compatible.
"""

from __future__ import annotations

import json

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mlsp_tpu.models import DGCNN
from mlsp_tpu.utils import chipcal


@pytest.fixture
def fake_tpu(monkeypatch, tmp_path):
    """Pretend the default backend is a TPU with a controllable cache."""
    monkeypatch.setenv("MLSP_JAX_CACHE", str(tmp_path))
    monkeypatch.setattr(chipcal, "_device_key", lambda: "tpu:FakeChip")

    def set_backend(kind):
        monkeypatch.setattr(jax, "default_backend", lambda: kind)

    yield set_backend, tmp_path


def _rec(winner):
    ms = {"moments": (1.0, 2.0), "fused": (2.0, 1.0)}[winner]
    return {"moments_ms": ms[0], "fused_ms": ms[1], "winner": winner}


def _write_cache(tmp_path, by_shape):
    (tmp_path / "chipcal.json").write_text(json.dumps(
        {"tpu:FakeChip": {s: _rec(w) for s, w in by_shape.items()}}))


class TestResolve:
    def test_non_tpu_is_moments(self):
        chipcal._MEMO.clear()
        assert chipcal.edge_impl() == "moments"  # CPU backend in tests

    @pytest.mark.parametrize("winner", ["moments", "fused"])
    def test_cached_verdict_honored(self, fake_tpu, winner):
        set_backend, tmp_path = fake_tpu
        set_backend("tpu")
        _write_cache(tmp_path, {s: winner for s in chipcal.SHAPES})
        chipcal._MEMO.clear()
        assert chipcal.edge_impl() == winner

    def test_mixed_verdict_cache_resolves_per_shape(self, fake_tpu):
        """Near-crossover silicon: the wide layer and the seg shape pick
        'fused' while the flagship C=64 layer stays 'moments'."""
        set_backend, tmp_path = fake_tpu
        set_backend("tpu")
        _write_cache(tmp_path, {"n1024_c64": "moments",
                                "n1024_c256": "fused",
                                "n2048_c64": "fused"})
        chipcal._MEMO.clear()
        assert chipcal.edge_impl(n=1024, c=64) == "moments"
        assert chipcal.edge_impl(n=1024, c=3) == "moments"  # layer 1
        assert chipcal.edge_impl(n=1024, c=256) == "fused"
        assert chipcal.edge_impl(n=2048, c=64) == "fused"
        # nearest-in-log-space for off-grid shapes
        assert chipcal.edge_impl(n=4096, c=80) == "fused"
        assert chipcal.edge_impl(n=512, c=48) == "moments"

    def test_exact_tie_prefers_larger_shape(self, fake_tpu):
        """C=128 ties exactly between the C=64 and C=256 records in
        log-space; the tie must break toward the LARGER measured C
        (conservative for per-row pricing), not dict order."""
        set_backend, tmp_path = fake_tpu
        set_backend("tpu")
        _write_cache(tmp_path, {"n1024_c64": "moments",
                                "n1024_c256": "fused",
                                "n2048_c64": "moments"})
        chipcal._MEMO.clear()
        assert chipcal.edge_impl(n=1024, c=128) == "fused"
        assert chipcal.nearest_shape_key(1024, 128) == "n1024_c256"

    def test_force_on_non_tpu_keeps_cache(self, fake_tpu):
        """edge_calibration(force=True) where measurement is impossible
        must fall back to the cached records, not discard them (the CLI
        would otherwise claim no cache exists)."""
        set_backend, tmp_path = fake_tpu
        set_backend("cpu")
        _write_cache(tmp_path, {s: "moments" for s in chipcal.SHAPES})
        chipcal._MEMO.clear()
        recs = chipcal.edge_calibration(force=True)
        assert set(recs) == set(chipcal.SHAPES)
        assert all(r["winner"] == "moments" for r in recs.values())

    def test_legacy_single_shape_cache_adopted(self, fake_tpu):
        """A round-4 flat record is adopted as the flagship shape's."""
        set_backend, tmp_path = fake_tpu
        set_backend("tpu")
        (tmp_path / "chipcal.json").write_text(json.dumps(
            {"tpu:FakeChip": _rec("fused")}))
        chipcal._MEMO.clear()
        assert chipcal.edge_impl(n=1024, c=64) == "fused"

    def test_in_trace_uncalibrated_warns_moments(self, fake_tpu):
        set_backend, tmp_path = fake_tpu
        set_backend("tpu")
        chipcal._MEMO.clear()
        got = {}

        def probe(x):
            with pytest.warns(UserWarning, match="no cached chip"):
                got["impl"] = chipcal.edge_impl()
            return x

        jax.make_jaxpr(probe)(jnp.zeros(1))
        assert got["impl"] == "moments"

    def test_calibration_record_roundtrip(self, fake_tpu, monkeypatch):
        set_backend, tmp_path = fake_tpu
        set_backend("tpu")
        chipcal._MEMO.clear()
        monkeypatch.setattr(
            chipcal, "measure_edge_impl",
            lambda shape="n1024_c64": {"moments_ms": 9.0, "fused_ms": 3.0,
                                       "winner": "fused", "shape": shape})
        recs = chipcal.edge_calibration()
        assert set(recs) == set(chipcal.SHAPES)
        assert all(r["winner"] == "fused" for r in recs.values())
        # persisted: a fresh resolve (memo cleared) reads the file
        chipcal._MEMO.clear()
        assert chipcal.edge_impl() == "fused"
        on_disk = json.loads((tmp_path / "chipcal.json").read_text())
        assert on_disk["tpu:FakeChip"]["n1024_c64"]["fused_ms"] == 3.0

    def test_partial_cache_measures_only_missing(self, fake_tpu,
                                                 monkeypatch):
        """A cache missing one shape re-measures ONLY that shape and
        keeps the existing records byte-identical."""
        set_backend, tmp_path = fake_tpu
        set_backend("tpu")
        _write_cache(tmp_path, {"n1024_c64": "moments",
                                "n1024_c256": "fused"})
        measured = []

        def fake_measure(shape="n1024_c64"):
            measured.append(shape)
            return _rec("fused")

        monkeypatch.setattr(chipcal, "measure_edge_impl", fake_measure)
        chipcal._MEMO.clear()
        recs = chipcal.edge_calibration()
        assert measured == ["n2048_c64"]
        assert recs["n1024_c64"]["winner"] == "moments"
        assert recs["n2048_c64"]["winner"] == "fused"


class TestDGCNNDispatch:
    """Both resolved branches trace from edge_impl='auto' with ONE param
    tree (auto flips are checkpoint-compatible)."""

    def _shapes(self, impl, monkeypatch):
        monkeypatch.setattr(chipcal, "edge_impl",
                            lambda n=1024, c=64: impl)
        model = DGCNN(num_classes=10, k=8)  # edge_impl="auto" default
        v = jax.eval_shape(
            lambda r, x: model.init({"params": r}, x, train=False,
                                    heads=("defrec",)),
            jax.random.key(0), jnp.zeros((1, 64, 3), jnp.float32))
        return [(jax.tree_util.keystr(p), l.shape)
                for p, l in jax.tree_util.tree_leaves_with_path(v)]

    def test_auto_traces_both_branches_same_tree(self, monkeypatch):
        a = self._shapes("moments", monkeypatch)
        b = self._shapes("fused", monkeypatch)
        assert a == b and len(a) > 50

    def test_mixed_per_layer_dispatch_same_tree(self, monkeypatch):
        """auto resolving DIFFERENT impls for different layer widths
        still yields the shared param tree (checkpoint-compatible)."""
        a = self._shapes("moments", monkeypatch)
        monkeypatch.setattr(
            chipcal, "edge_impl",
            lambda n=1024, c=64: "fused" if c >= 128 else "moments")
        model = DGCNN(num_classes=10, k=8)
        v = jax.eval_shape(
            lambda r, x: model.init({"params": r}, x, train=False,
                                    heads=("defrec",)),
            jax.random.key(0), jnp.zeros((1, 64, 3), jnp.float32))
        mixed = [(jax.tree_util.keystr(p), l.shape)
                 for p, l in jax.tree_util.tree_leaves_with_path(v)]
        assert mixed == a

    def test_auto_resolves_on_output_width(self, monkeypatch):
        """The dispatch cost shape is the layer's OUTPUT width (EdgeConvM
        projects to c_out before its gather/moments), so auto must ask
        chipcal for c_out — 64/64/128/256 — not the input widths."""
        asked = []

        def spy(n=1024, c=64):
            asked.append(c)
            return "moments"

        monkeypatch.setattr(chipcal, "edge_impl", spy)
        model = DGCNN(num_classes=10, k=8)
        jax.eval_shape(
            lambda r, x: model.init({"params": r}, x, train=False,
                                    heads=("defrec",)),
            jax.random.key(0), jnp.zeros((1, 64, 3), jnp.float32))
        assert asked == [64, 64, 128, 256]

    def test_forced_moments_runs(self):
        model = DGCNN(num_classes=10, k=8, edge_impl="moments")
        v = model.init({"params": jax.random.key(0)},
                       jnp.zeros((2, 64, 3), jnp.float32), train=False)
        out = model.apply(v, jnp.asarray(
            np.random.default_rng(0).standard_normal((2, 64, 3)),
            jnp.float32), train=False)
        assert np.isfinite(np.asarray(out["cls"])).all()
