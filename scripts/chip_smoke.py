"""Real-chip smoke: every model family compiles and runs a train-mode
gradient step + an eval forward on the TPU, finite outputs asserted.

Usage: python scripts/chip_smoke.py [family ...]
"""

import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from mlsp_tpu.utils.cache import enable

enable()

from mlsp_tpu.models import make_model  # noqa: E402

FAMILIES = {
    # name: (make_model kwargs, heads, N, is_seg)
    "pointnet": ({}, ("defrec",), 1024, False),
    "dgcnn": ({}, ("defrec", "normal", "scan", "density"), 1024, False),
    "pointnet2": ({}, (), 1024, False),
    "transformer": ({}, ("defrec",), 1024, False),
    "vit": ({}, ("defrec",), 1024, False),
    "hengshuang": ({}, ("defrec",), 1024, False),
    "dgcnn_seg": ({"num_classes": 8}, ("seg", "defrec"), 2048, True),
    "hengshuang_seg": ({"num_classes": 8}, ("seg", "defrec"), 1024, True),
}


def smoke(name):
    kw, heads, N, is_seg = FAMILIES[name]
    kw = dict(kw)  # FAMILIES is shared; don't pop from the module dict
    B = 8
    model = make_model(name, kw.pop("num_classes", 10), **kw)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((B, N, 3)) * 0.5, jnp.float32)
    y = jnp.asarray(rng.integers(0, 8 if is_seg else 10,
                                 (B, N) if is_seg else (B,)))
    v = jax.jit(lambda r, xx: model.init(
        {"params": r}, xx, train=False, heads=heads))(
        jax.random.key(0), x)

    out_key = "seg" if is_seg else "cls"

    def loss(p, bs, x, y):
        o, _ = model.apply({"params": p, "batch_stats": bs}, x, train=True,
                           heads=heads, mutable=["batch_stats"],
                           rngs={"dropout": jax.random.key(1)})
        logp = jax.nn.log_softmax(o[out_key], -1)
        return -jnp.take_along_axis(logp, y[..., None], -1).mean()

    t0 = time.perf_counter()
    g = jax.jit(jax.grad(loss))(v["params"], v["batch_stats"], x, y)
    gmax = max(float(jnp.abs(l).max())
               for l in jax.tree_util.tree_leaves(g))
    o = jax.jit(lambda p, bs, xx: model.apply(
        {"params": p, "batch_stats": bs}, xx, train=False, heads=heads))(
        v["params"], v["batch_stats"], x)
    omax = float(jnp.abs(o[out_key]).max())  # forced fetch = completion
    dt = time.perf_counter() - t0
    ok = np.isfinite(gmax) and np.isfinite(omax)
    print(json.dumps({"family": name, "ok": bool(ok), "N": N,
                      "grad_max": round(gmax, 4), "out_max": round(omax, 4),
                      "compile_run_s": round(dt, 1)}), flush=True)
    if not ok:
        raise SystemExit(f"{name}: non-finite outputs")


if __name__ == "__main__":
    for fam in sys.argv[1:] or FAMILIES:
        smoke(fam)
