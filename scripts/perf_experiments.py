"""One-off perf experiments for the train-step gap analysis.

Times grads of the 3-head train forward with variations (dropout off,
eval-mode BN) and sweeps the kNN kernel tile size. Run on TPU:
    python scripts/perf_experiments.py
"""

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

from mlsp_tpu.utils.cache import enable as enable_cache
from mlsp_tpu.utils.timing import timed_scan




def main():
    enable_cache()
    from mlsp_tpu.models import DGCNN
    from mlsp_tpu.ops.pallas.knn_pallas import knn_pallas
    from mlsp_tpu.train import create_train_state

    B, N, S, k = 32, 1024, 16, 20
    rng = np.random.default_rng(0)
    xs = jnp.asarray(rng.standard_normal((S, B, N, 3)), jnp.float32)
    keys = jax.random.split(jax.random.key(1), S)
    out = {}

    # --- kNN kernel tile sweep (coords C=3 and features C=128) ---
    fxs = jnp.asarray(rng.standard_normal((S, B, N, 128)), jnp.float32)
    for tile in (64, 128, 256, 512):
        out[f"knn_tile{tile}_C3"] = timed_scan(
            lambda x, t=tile: jnp.sum(knn_pallas(x, k, t) % 7).astype(jnp.float32),
            xs, S)
        out[f"knn_tile{tile}_C128"] = timed_scan(
            lambda x, t=tile: jnp.sum(knn_pallas(x, k, t) % 7).astype(jnp.float32),
            fxs, S)

    # --- grads of the 3-head forward: dropout on/off ---
    for name, dropout in (("dropout0.5", 0.5), ("dropout0.0", 0.0)):
        model = DGCNN(num_classes=10, k=k, knn_backend="auto", dropout=dropout)
        state = create_train_state(
            model, jax.random.key(0), jnp.zeros((B, N, 3), jnp.float32),
            epochs=150, steps_per_epoch=100,
            heads=("defrec", "normal", "scan", "density"),
        )

        def grads_3heads(xk, model=model, state=state):
            x, key = xk[0], xk[1][0]

            def loss(p):
                o, _ = model.apply(
                    {"params": p, "batch_stats": state.batch_stats}, x,
                    train=True, heads=("defrec", "normal", "density"),
                    rngs={"dropout": key}, mutable=["batch_stats"],
                )
                return (jnp.sum(o["defrec"].astype(jnp.float32) ** 2)
                        + jnp.sum(o["normal"].astype(jnp.float32) ** 2)
                        + jnp.sum(o["density"].astype(jnp.float32) ** 2))

            g = jax.grad(loss)(state.params)
            return sum(jnp.sum(l.astype(jnp.float32) ** 2)
                       for l in jax.tree_util.tree_leaves(g))

        out[f"grads_3heads_{name}"] = timed_scan(
            grads_3heads, (xs, keys[:, None]), S)

    print(json.dumps({n: round(v * 1e3, 2) for n, v in out.items()}, indent=1))


if __name__ == "__main__":
    main()
