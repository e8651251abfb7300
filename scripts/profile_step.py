"""Per-stage timing breakdown of the paper-recipe train step.

Each stage is measured as a scanned device program with a forced value
fetch (the only trustworthy protocol through the TPU relay — CLAUDE.md).
Stages overlap (the full step contains all of them), so the numbers are
an attribution guide, not a partition.

Run on the TPU chip: python scripts/profile_step.py
"""

import json
import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from mlsp_tpu.utils.cache import enable as enable_cache
from mlsp_tpu.utils.timing import timed_scan




def main():
    enable_cache()
    from mlsp_tpu import ops
    from mlsp_tpu import transforms as T
    from mlsp_tpu.models import DGCNN
    from mlsp_tpu.train import create_train_state, steps
    from mlsp_tpu.utils.config import PointDAConfig

    B, N, S, k = 32, 1024, 16, 20
    cfg = PointDAConfig(
        batch_size=B, num_points=N, synthetic=True, radius=0.135,
        Density_normal_viainput=True, Normal_ondef=True, Density_ondef=True,
    )
    model = DGCNN(num_classes=10, k=k, knn_backend="auto")
    state = create_train_state(
        model, jax.random.key(0), jnp.zeros((B, N, 3), jnp.float32),
        epochs=150, steps_per_epoch=100,
        heads=("defrec", "normal", "scan", "density"),
    )
    rng = np.random.default_rng(0)
    xs = jnp.asarray(rng.standard_normal((S, B, N, 3)), jnp.float32)
    keys = jax.random.split(jax.random.key(1), S)

    out = {}

    # --- primitive stages ---
    out["knn_pallas"] = timed_scan(
        lambda x: jnp.sum(ops.knn_indices(x, k, backend="pallas") % 7).astype(jnp.float32), xs, S)
    out["knn_xla"] = timed_scan(
        lambda x: jnp.sum(ops.knn_indices(x, k, backend="xla") % 7).astype(jnp.float32), xs, S)
    out["fps"] = timed_scan(
        lambda x: jnp.sum(ops.fps(x, N, jnp.zeros((B,), jnp.int32)) % 7).astype(jnp.float32),
        xs, S)
    out["estimate_normals"] = timed_scan(
        lambda x: jnp.sum(ops.estimate_normals(x, cfg.near)).astype(jnp.float32), xs, S)
    out["density_labels"] = timed_scan(
        lambda x: jnp.sum(ops.density_labels(x, cfg.radius, 16, 2.0)[1]), xs, S)
    out["deform_batch"] = timed_scan(
        lambda xk: jnp.sum(T.deform_batch(xk[1][0], xk[0], cfg.num_regions)[0]),
        (xs, keys[:, None]), S)
    out["pcm_mix"] = timed_scan(
        lambda xk: jnp.sum(steps.pcm_mix(xk[1][0], xk[0],
                                         jnp.zeros((B,), jnp.int32),
                                         cfg.mixup_params)[0]),
        (xs, keys[:, None]), S)

    # --- model stages ---
    v = {"params": state.params, "batch_stats": state.batch_stats}

    def fwd_eval(x):
        return jnp.sum(model.apply(v, x, train=False)["cls"].astype(jnp.float32))

    out["forward_eval_cls"] = timed_scan(fwd_eval, xs, S)

    def fwd_train_heads(xk):
        x, key = xk[0], xk[1][0]
        o, _ = model.apply(
            v, x, train=True, heads=("defrec", "normal", "density"),
            rngs={"dropout": key}, mutable=["batch_stats"],
        )
        return jnp.sum(o["defrec"].astype(jnp.float32))

    out["forward_train_3heads"] = timed_scan(fwd_train_heads, (xs, keys[:, None]), S)

    def grads_3heads(xk):
        x, key = xk[0], xk[1][0]

        def loss(p):
            o, _ = model.apply(
                {"params": p, "batch_stats": state.batch_stats}, x, train=True,
                heads=("defrec", "normal", "density"),
                rngs={"dropout": key}, mutable=["batch_stats"],
            )
            return (jnp.sum(o["defrec"].astype(jnp.float32) ** 2)
                    + jnp.sum(o["normal"].astype(jnp.float32) ** 2)
                    + jnp.sum(o["density"].astype(jnp.float32) ** 2))

        g = jax.grad(loss)(state.params)
        return sum(jnp.sum(l.astype(jnp.float32) ** 2)
                   for l in jax.tree_util.tree_leaves(g))

    out["grads_train_3heads"] = timed_scan(grads_3heads, (xs, keys[:, None]), S)

    # --- full step reference ---
    sxs = xs
    sys_ = jnp.asarray(rng.integers(0, 10, (S, B)))
    txs = jnp.asarray(rng.standard_normal((S, B, N, 3)), jnp.float32)
    st = state
    st, ms = steps.pointda_train_scan(st, sxs, sys_, txs, jax.random.key(2), cfg)
    float(ms["total"][-1])
    best = float("inf")
    for t in range(3):
        t0 = time.perf_counter()
        st, ms = steps.pointda_train_scan(st, sxs, sys_, txs,
                                          jax.random.fold_in(jax.random.key(2), t), cfg)
        float(ms["total"][-1])
        best = min(best, time.perf_counter() - t0)
    out["FULL_STEP"] = best / S

    print(json.dumps({n: round(v * 1e3, 2) for n, v in out.items()}, indent=1))


if __name__ == "__main__":
    main()
