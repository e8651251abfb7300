"""Per-chip calibration: pick the EdgeConv implementation by MEASURING.

The DGCNN EdgeConv core has two TPU implementations with opposite
hardware affinities (round-3 analysis, CLAUDE.md):

* ``moments`` — the XLA gather/scatter per-row path. Cost is the sparse
  row rate (XLA lowers scatter as sort + segmented add); on this image's
  throttled dev chip (~50-70M scatter rows/s, VPU at ~10% of nominal) it
  is 2.5-3x FASTER than the fused kernel.
* ``fused`` — the gather/scatter-free Pallas edge-moments kernel
  (``ops/pallas/edge_pallas.py``). Cost is O(N^2 C) VPU work; on
  full-rate silicon (~4T VPU ops/s) its roofline is ~10x faster than
  the sparse path.

No static rule gets both chips right, so ``edge_impl="auto"`` (the
DGCNN default) runs a ONE-TIME direct A/B of the two real layer
implementations — one neighbourhood-statistics layer, forward+backward,
at the flagship shape — and caches the verdict in
``.jax_cache/chipcal.json`` keyed by the device kind. Timing follows the
bench.py protocol (scanned chain ending in a value fetch; through the
axon relay ``block_until_ready`` returns early).

Resolution rules:
* non-TPU backend -> ``moments`` (the Pallas kernel is TPU-only);
* cached verdict for this device kind -> use it;
* no cache, outside any jax trace -> measure now (~1 min first-time
  compile, cached persistently afterwards);
* no cache, INSIDE a trace (a user jitting a model without prior
  calibration) -> ``moments`` with a one-time warning — measuring would
  require executing programs mid-trace. Trainers/bench/CLI call
  :func:`edge_impl` eagerly so production paths never hit this.
"""

from __future__ import annotations

import json
import os
import warnings

_MEMO: dict[str, str] = {}
_B, _N, _K, _C, _S = 8, 1024, 20, 64, 4


def _cache_path() -> str:
    from mlsp_tpu.utils.cache import _DEFAULT

    return os.path.join(os.environ.get("MLSP_JAX_CACHE", _DEFAULT),
                        "chipcal.json")


def _device_key() -> str:
    import jax

    d = jax.devices()[0]
    return f"{d.platform}:{getattr(d, 'device_kind', '?')}"


def _load_cache() -> dict:
    try:
        with open(_cache_path()) as f:
            return json.load(f)
    except (OSError, ValueError):
        return {}


def measure_edge_impl() -> dict:
    """Direct A/B of the two real edge implementations on this chip.

    One EdgeConvM-equivalent neighbourhood-statistics layer (kNN build +
    max/min/sum/sumsq over k neighbours — the fused kernel absorbs the
    kNN build), forward+backward at B=8, N=1024, C=64, k=20 (the
    flagship model's dominant layer shape). Returns
    ``{"moments_ms", "fused_ms", "winner"}``.
    """
    import jax
    import jax.numpy as jnp
    import numpy as np

    from mlsp_tpu.ops.knn import knn_gather, knn_indices
    from mlsp_tpu.ops.pallas.edge_pallas import edge_moments
    from mlsp_tpu.utils.timing import timed_fetch

    rng = np.random.default_rng(0)
    xg = jnp.asarray(rng.standard_normal((_B, _N, _C)), jnp.float32)
    u = jnp.asarray(rng.standard_normal((_B, _N, _C)), jnp.float32)
    cot = jnp.asarray(rng.standard_normal((4, _B, _N, _C)), jnp.float32)

    def stats_moments(xg_, u_):
        idx = knn_indices(xg_, _K, backend="xla")
        g = knn_gather(u_, idx)
        return (jnp.max(g, -2), jnp.min(g, -2), jnp.sum(g, -2),
                jnp.sum(g * g, -2))

    def stats_fused(xg_, u_):
        return edge_moments(xg_, u_, _K)

    out = {}
    for name, stats in (("moments", stats_moments), ("fused", stats_fused)):
        def loss(u_, xg_, cot_, stats=stats):
            mx, mn, s1, s2 = stats(xg_, u_)
            return jnp.sum(mx * cot_[0] + mn * cot_[1] + s1 * cot_[2]
                           + s2 * cot_[3])

        gfn = jax.grad(loss)

        @jax.jit
        def chain(u, xg, cot, gfn=gfn):
            def body(c, _):
                return jnp.max(gfn(u + c * 1e-9, xg, cot)) * 1e-9, ()

            c, _ = jax.lax.scan(body, jnp.float32(0.0), (), length=_S)
            return c

        timed_fetch(chain, u, xg, cot, trials=1)  # compile + warm
        out[f"{name}_ms"] = round(
            timed_fetch(chain, u, xg, cot) / _S * 1e3, 2)
    out["winner"] = ("fused" if out["fused_ms"] < out["moments_ms"]
                     else "moments")
    return out


def edge_calibration(force: bool = False) -> dict:
    """The cached A/B record for this device kind, measuring if needed
    (and allowed). Returns {} when measurement is impossible here."""
    import jax

    key = _device_key()
    cache = _load_cache()
    if not force and key in cache:
        return cache[key]
    if jax.default_backend() != "tpu":
        return {}
    from jax._src import core as _core  # jax.core alias removed in 0.9

    if not _core.trace_state_clean():
        return {}
    rec = measure_edge_impl()
    cache[key] = rec
    path = _cache_path()
    try:
        os.makedirs(os.path.dirname(path), exist_ok=True)
        with open(path, "w") as f:
            json.dump(cache, f, indent=1)
    except OSError:
        pass  # read-only FS: the in-process memo still applies
    _MEMO[key] = rec["winner"]
    return rec


def edge_impl() -> str:
    """Resolve ``edge_impl="auto"`` for the current default backend."""
    import jax

    if jax.default_backend() != "tpu":
        return "moments"
    key = _device_key()
    if key in _MEMO:
        return _MEMO[key]
    rec = edge_calibration()
    if rec:
        _MEMO[key] = rec["winner"]
        return rec["winner"]
    warnings.warn(
        "edge_impl='auto' resolved inside a jax trace with no cached "
        "chip calibration — defaulting to 'moments'. Call "
        "mlsp_tpu.utils.chipcal.edge_calibration() once outside jit "
        "(trainers/bench/CLI do) to calibrate this chip.", stacklevel=2)
    _MEMO[key] = "moments"
    return "moments"
