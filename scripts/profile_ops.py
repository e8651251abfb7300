"""Per-op attribution of the full train step from an XLA profiler trace.

Captures a device trace of one scanned train program and aggregates
device-side event durations by HLO op category. Run on TPU:
    python scripts/profile_ops.py
"""

import collections
import glob
import gzip
import json
import os
import re
import shutil

import jax
import jax.numpy as jnp
import numpy as np

from mlsp_tpu.utils.cache import enable as enable_cache

LOGDIR = "/tmp/jaxtrace_ops"


def categorize(name: str) -> str:
    n = name.lower()
    for pat, cat in (
        ("gather", "gather"), ("scatter", "scatter"), ("sort", "sort/topk"),
        ("top-k", "sort/topk"), ("topk", "sort/topk"),
        ("dot", "matmul"), ("conv", "matmul"),
        ("rng", "rng"), ("threefry", "rng"), ("iota", "rng"),
        ("reduce-window", "reduce"), ("reduce", "reduce"),
        ("transpose", "copy/transpose"), ("copy", "copy/transpose"),
        ("concatenate", "copy/transpose"), ("pad", "copy/transpose"),
        ("slice", "copy/transpose"), ("select", "elementwise"),
        ("fusion", "fusion(elementwise)"), ("custom-call", "custom-call"),
        ("while", "control"), ("all-reduce", "collective"),
    ):
        if pat in n:
            return cat
    return "other"


def main():
    enable_cache()
    from mlsp_tpu.models import DGCNN
    from mlsp_tpu.train import create_train_state, steps
    from mlsp_tpu.utils.config import PointDAConfig

    B, N, S = 32, 1024, 16
    cfg = PointDAConfig(
        batch_size=B, num_points=N, synthetic=True, radius=0.135,
        Density_normal_viainput=True, Normal_ondef=True, Density_ondef=True,
    )
    model = DGCNN(num_classes=10, k=20, knn_backend="auto")
    state = create_train_state(
        model, jax.random.key(0), jnp.zeros((B, N, 3), jnp.float32),
        epochs=150, steps_per_epoch=100,
        heads=("defrec", "normal", "scan", "density"),
    )
    rng = np.random.default_rng(0)
    sxs = jnp.asarray(rng.standard_normal((S, B, N, 3)), jnp.float32)
    sys_ = jnp.asarray(rng.integers(0, 10, (S, B)))
    txs = jnp.asarray(rng.standard_normal((S, B, N, 3)), jnp.float32)
    key = jax.random.key(1)

    state, ms = steps.pointda_train_scan(state, sxs, sys_, txs, key, cfg)
    float(ms["total"][-1])  # warm + compile

    shutil.rmtree(LOGDIR, ignore_errors=True)
    jax.profiler.start_trace(LOGDIR)
    state, ms = steps.pointda_train_scan(
        state, sxs, sys_, txs, jax.random.fold_in(key, 1), cfg)
    float(ms["total"][-1])
    jax.profiler.stop_trace()

    paths = glob.glob(os.path.join(LOGDIR, "**", "*.trace.json.gz"),
                      recursive=True)
    assert paths, f"no trace under {LOGDIR}"
    with gzip.open(sorted(paths)[-1], "rt") as f:
        trace = json.load(f)

    # Device-side complete events: pid whose name mentions TPU/device.
    pid_names = {e["pid"]: e.get("args", {}).get("name", "")
                 for e in trace["traceEvents"]
                 if e.get("ph") == "M" and e.get("name") == "process_name"}
    dev_pids = {p for p, n in pid_names.items()
                if re.search(r"tpu|device|/device|xla", n, re.I)
                and not re.search(r"host|python", n, re.I)}
    by_cat = collections.Counter()
    by_name = collections.Counter()
    total = 0.0
    for e in trace["traceEvents"]:
        if e.get("ph") != "X" or e.get("pid") not in dev_pids:
            continue
        dur = e.get("dur", 0) / 1e3  # us -> ms
        name = e.get("name", "?")
        by_cat[categorize(name)] += dur
        by_name[name] += dur
        total += dur
    print(json.dumps({"pids": {str(p): pid_names[p] for p in dev_pids},
                      "total_device_ms": round(total, 1),
                      "per_step_ms": round(total / S, 2)}))
    print("\n== by category (ms total /", S, "steps) ==")
    for cat, ms_ in by_cat.most_common():
        print(f"  {cat:24s} {ms_:9.1f}  ({ms_/S:7.2f}/step)")
    print("\n== top 25 ops ==")
    for name, ms_ in by_name.most_common(25):
        print(f"  {ms_:9.1f}  {name[:110]}")


if __name__ == "__main__":
    main()
