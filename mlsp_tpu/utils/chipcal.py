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
implementations — one neighbourhood-statistics layer, forward+backward —
and caches the verdict in ``.jax_cache/chipcal.json`` keyed by the
device kind. Timing follows the bench.py protocol (scanned chain ending
in a value fetch; through the axon relay ``block_until_ready`` returns
early).

The A/B is SHAPE-AWARE (the moments/fused ratio is shape-dependent —
round 3 measured fwd+bwd 71 vs 22.5 ms at C=64 but 75 vs 32 at C=256,
and the seg model runs at N=2048): :data:`SHAPES` is the measured grid
(the flagship layer, its widest C, and the seg shape), the cache holds
one record per shape class, and :func:`edge_impl` resolves a concrete
``(n, c)`` to the nearest measured class in log-space — so on
near-crossover silicon different layers of the SAME model can get
different verdicts. ``mlsp-tpu calibrate [--force]`` (re)runs the grid.

Resolution rules:
* non-TPU backend -> ``moments`` (the Pallas kernel is TPU-only);
* cached verdict for this device kind + nearest shape -> use it;
* no cache, outside any jax trace -> measure now (~1 min per shape
  first-time compile, cached persistently afterwards);
* no cache, INSIDE a trace (a user jitting a model without prior
  calibration) -> ``moments`` with a one-time warning — measuring would
  require executing programs mid-trace. Trainers/bench/CLI call
  :func:`edge_impl` eagerly so production paths never hit this.
"""

from __future__ import annotations

import json
import math
import os
import warnings

_MEMO: dict[tuple[str, str], str] = {}
_K, _S = 20, 4

#: Measured shape-class grid: flagship cls layer, its widest layer, and
#: the seg model's operating point (PointSegDA runs at N=2048).
SHAPES: dict[str, dict] = {
    "n1024_c64": dict(B=8, N=1024, C=64),
    "n1024_c256": dict(B=8, N=1024, C=256),
    "n2048_c64": dict(B=8, N=2048, C=64),
}


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
            cache = json.load(f)
    except (OSError, ValueError):
        return {}
    # Legacy format (round 4): one flat record per device, measured at
    # the flagship shape. Adopt it as that shape's record.
    for dev, rec in list(cache.items()):
        if isinstance(rec, dict) and "winner" in rec:
            cache[dev] = {"n1024_c64": rec}
    return cache


def _shape_dist(key: str, n: int, c: int):
    """Log-space distance of a measured shape class to a concrete
    (n, c), with a deterministic tie-break toward the LARGER measured C
    (a C=128 layer ties between the C=64 and C=256 records; rounding
    the cost shape up is the conservative choice for per-row pricing).
    Unknown legacy keys sort last."""
    s = SHAPES.get(key)
    if s is None:  # unknown legacy key: match anything, last resort
        return (float("inf"), 0)
    return (abs(math.log(s["N"] / n)) + abs(math.log(s["C"] / c)),
            -s["C"])


def nearest_shape_key(n: int, c: int, records=None) -> str:
    """The measured shape class nearest to a concrete layer shape.

    Over :data:`SHAPES` by default, or over a (possibly partial) cached
    ``records`` dict. The single source of the nearest-shape rule —
    :func:`edge_impl` and :func:`resolve_shape` both route here."""
    keys = SHAPES if records is None else records
    return min(keys, key=lambda k: _shape_dist(k, n, c))


def resolve_shape(records: dict, n: int, c: int) -> dict:
    """Nearest measured shape-class record for a concrete layer.
    Pure lookup — unit-testable without a TPU."""
    return records[nearest_shape_key(n, c, records)]


def measure_edge_impl(shape: str = "n1024_c64") -> dict:
    """Direct A/B of the two real edge implementations on this chip.

    One EdgeConvM-equivalent neighbourhood-statistics layer (kNN build +
    max/min/sum/sumsq over k neighbours — the fused kernel absorbs the
    kNN build), forward+backward at the given :data:`SHAPES` class.
    Returns ``{"moments_ms", "fused_ms", "winner"}``.
    """
    import jax
    import jax.numpy as jnp
    import numpy as np

    from mlsp_tpu.ops.knn import knn_gather, knn_indices
    from mlsp_tpu.ops.pallas.edge_pallas import edge_moments
    from mlsp_tpu.utils.timing import timed_fetch

    dims = SHAPES[shape]
    B, N, C = dims["B"], dims["N"], dims["C"]
    rng = np.random.default_rng(0)
    xg = jnp.asarray(rng.standard_normal((B, N, C)), jnp.float32)
    u = jnp.asarray(rng.standard_normal((B, N, C)), jnp.float32)
    cot = jnp.asarray(rng.standard_normal((4, B, N, C)), jnp.float32)

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
    """The cached per-shape A/B records for this device kind, measuring
    any missing shape class if needed (and allowed). Returns a dict
    ``{shape_key: {"moments_ms", "fused_ms", "winner"}}``, or {} when
    measurement is impossible here and nothing is cached.

    ``force=True`` re-measures where measurement is possible; where it
    is NOT (non-TPU backend, or inside a trace) it falls back to the
    cached records rather than discarding them — a readable cache never
    turns into a "no calibration" answer."""
    import jax

    key = _device_key()
    cache = _load_cache()
    cached = dict(cache.get(key, {}))
    records = cached if not force else {}
    missing = [s for s in SHAPES if s not in records]
    if not missing:
        return records
    if jax.default_backend() != "tpu":
        return records or cached
    from jax._src import core as _core  # jax.core alias removed in 0.9

    if not _core.trace_state_clean():
        return records or cached
    for shape in missing:
        records[shape] = measure_edge_impl(shape)
    cache[key] = records
    path = _cache_path()
    try:
        os.makedirs(os.path.dirname(path), exist_ok=True)
        with open(path, "w") as f:
            json.dump(cache, f, indent=1)
    except OSError:
        pass  # read-only FS: the in-process memo still applies
    for shape, rec in records.items():
        _MEMO[(key, shape)] = rec["winner"]
    return records


def edge_impl(n: int = 1024, c: int = 64) -> str:
    """Resolve ``edge_impl="auto"`` for one concrete layer shape on the
    current default backend."""
    import jax

    if jax.default_backend() != "tpu":
        return "moments"
    key = _device_key()
    shape = nearest_shape_key(n, c)
    if (key, shape) in _MEMO:
        return _MEMO[(key, shape)]
    # A cached record for the nearest shape settles it — don't trigger
    # measurement of OTHER missing shapes from a resolve.
    records = _load_cache().get(key, {})
    if shape not in records:
        records = edge_calibration()
    if records:
        winner = resolve_shape(records, n, c)["winner"]
        _MEMO[(key, shape)] = winner
        return winner
    warnings.warn(
        "edge_impl='auto' resolved inside a jax trace with no cached "
        "chip calibration — defaulting to 'moments'. Call "
        "mlsp_tpu.utils.chipcal.edge_calibration() once outside jit "
        "(trainers/bench/CLI do) to calibrate this chip.", stacklevel=2)
    _MEMO[(key, shape)] = "moments"
    return "moments"
