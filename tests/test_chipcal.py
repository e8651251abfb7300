"""Chip-calibrated EdgeConv dispatch (`utils/chipcal.py`).

The dispatch must (a) honor a cached verdict for this device kind,
(b) fall back to the safe XLA path inside a trace with no calibration
(with a warning), and (c) drive BOTH DGCNN branches from the resolved
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


def _write_cache(tmp_path, winner):
    (tmp_path / "chipcal.json").write_text(json.dumps(
        {"tpu:FakeChip": {"moments_ms": 1.0, "fused_ms": 2.0,
                          "winner": winner}}))


class TestResolve:
    def test_non_tpu_is_moments(self):
        chipcal._MEMO.clear()
        assert chipcal.edge_impl() == "moments"  # CPU backend in tests

    @pytest.mark.parametrize("winner", ["moments", "fused"])
    def test_cached_verdict_honored(self, fake_tpu, winner):
        set_backend, tmp_path = fake_tpu
        set_backend("tpu")
        _write_cache(tmp_path, winner)
        chipcal._MEMO.clear()
        assert chipcal.edge_impl() == winner

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
            lambda: {"moments_ms": 9.0, "fused_ms": 3.0, "winner": "fused"})
        rec = chipcal.edge_calibration()
        assert rec["winner"] == "fused"
        # persisted: a fresh resolve (memo cleared) reads the file
        chipcal._MEMO.clear()
        assert chipcal.edge_impl() == "fused"
        on_disk = json.loads((tmp_path / "chipcal.json").read_text())
        assert on_disk["tpu:FakeChip"]["fused_ms"] == 3.0


class TestDGCNNDispatch:
    """Both resolved branches trace from edge_impl='auto' with ONE param
    tree (auto flips are checkpoint-compatible)."""

    def _shapes(self, impl, monkeypatch):
        monkeypatch.setattr(chipcal, "edge_impl", lambda: impl)
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

    def test_forced_moments_runs(self):
        model = DGCNN(num_classes=10, k=8, edge_impl="moments")
        v = model.init({"params": jax.random.key(0)},
                       jnp.zeros((2, 64, 3), jnp.float32), train=False)
        out = model.apply(v, jnp.asarray(
            np.random.default_rng(0).standard_normal((2, 64, 3)),
            jnp.float32), train=False)
        assert np.isfinite(np.asarray(out["cls"])).all()
