"""Attribute the bench step's device time by XLA op category.

One jax.profiler trace of the bench-config train step, aggregated from
the TPU "XLA Ops" lane (leaf ops only — the jit/while/step rows are
containers that double-count). This is the ground truth for the bench
roofline residual: whatever the flops+sparse bounds don't cover shows
up here by name.

Round-4 result on the dev chip (t_step 249.5 ms):
  fusion (elementwise/reduce + the sparse gather/scatter bodies) 170.2,
  reshape 23.4, knn_indices (pallas) 15.2, dot 14.2, copy/transpose
  13.4, sort/top_k 5.8, knn_moments_pallas 3.1, fps 2.6.
The ~18 ms the two bench bounds miss is the LAYOUT traffic —
reshape+copy at 36.8 ms/step, partially overlapped with the bounds'
phases. Named and accounted: bench.py reports it as
`t_layout_ms_attributed`.

Run: PYTHONPATH=.:$PYTHONPATH python scripts/attrib_step_trace.py
"""

import collections
import glob
import gzip
import json
import os
import shutil

import jax
import jax.numpy as jnp
import numpy as np

from mlsp_tpu.utils.cache import enable as enable_cache

TRACE_DIR = "/tmp/jaxtrace_attrib"


def categorize(name: str) -> str:
    n = name.lower()
    if "while" in n or n.isdigit() or n.startswith("jit_"):
        return "CONTAINER"
    if "scatter" in n:
        return "scatter"
    if "gather" in n:
        return "gather"
    if "sort" in n or "top-k" in n or "topk" in n:
        return "sort/topk"
    if "dot" in n or "conv" in n:
        return "dot"
    if "reduce-window" in n:
        return "reduce-window"
    if "reshape" in n:
        return "reshape"
    if "copy" in n or "transpose" in n or "bitcast" in n:
        return "copy/layout"
    if "fusion" in n:
        return "fusion(elementwise/reduce/sparse)"
    return "other:" + n.split(".")[0]


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
    model = DGCNN(num_classes=10, k=20, knn_backend="auto",
                  head_dtype=jnp.bfloat16)
    state = create_train_state(
        model, jax.random.key(0), jnp.zeros((B, N, 3), jnp.float32),
        epochs=150, steps_per_epoch=100,
        heads=("defrec", "normal", "scan", "density"))
    rng = np.random.default_rng(0)
    sxs = jnp.asarray(rng.standard_normal((S, B, N, 3)), jnp.float32)
    sys_ = jnp.asarray(rng.integers(0, 10, (S, B)))
    txs = jnp.asarray(rng.standard_normal((S, B, N, 3)), jnp.float32)
    key = jax.random.key(1)

    state, ms = steps.pointda_train_scan(state, sxs, sys_, txs, key, cfg)
    float(ms["total"][-1])  # compile + warm

    shutil.rmtree(TRACE_DIR, ignore_errors=True)
    with jax.profiler.trace(TRACE_DIR):
        state, ms = steps.pointda_train_scan(
            state, sxs, sys_, txs, jax.random.fold_in(key, 7), cfg)
        float(ms["total"][-1])

    paths = glob.glob(os.path.join(
        TRACE_DIR, "**", "*.trace.json.gz"), recursive=True)
    assert paths, f"no trace under {TRACE_DIR}"
    with gzip.open(sorted(paths)[-1], "rt") as f:
        trace = json.load(f)
    ev = trace["traceEvents"]

    # the TPU device pid's "XLA Ops" thread carries the leaf op events
    dev_pid = next(e["pid"] for e in ev
                   if e.get("ph") == "M" and e.get("name") == "process_name"
                   and "TPU" in e["args"].get("name", ""))
    ops_tid = next(e["tid"] for e in ev
                   if e.get("ph") == "M" and e.get("name") == "thread_name"
                   and e["pid"] == dev_pid
                   and e["args"].get("name") == "XLA Ops")

    cat_us = collections.Counter()
    top = collections.Counter()
    for e in ev:
        if (e.get("ph") == "X" and e.get("pid") == dev_pid
                and e.get("tid") == ops_tid):
            c = categorize(e.get("name", ""))
            if c == "CONTAINER":
                continue
            cat_us[c] += e.get("dur", 0)
            top[e["name"]] += e.get("dur", 0)
    total = sum(cat_us.values())
    print(json.dumps({
        "steps": S,
        "leaf_total_ms_per_step": round(total / 1e3 / S, 2),
        "by_category_ms_per_step": {
            k: round(v / 1e3 / S, 2) for k, v in cat_us.most_common()},
        "top_ops_ms_per_step": {
            k[:60]: round(v / 1e3 / S, 2) for k, v in top.most_common(12)},
    }, indent=1))


if __name__ == "__main__":
    main()
