"""Headline benchmark: full MLSP train-step throughput on one TPU chip.

Config matches the reference's headline workload (BASELINE.md): DGCNN
k=20, 1024 points, batch 32, full paper recipe (PCM mixup + DefRec +
normal + density heads with on-device label generation) — i.e. one
complete optimizer step per iteration, everything the reference does per
iteration including the work it did on CPU (PCL normals, kd-tree radius
counts, numpy FPS).

Baseline: the reference repo publishes no numbers (BASELINE.md). The
V100 estimate used for `vs_baseline` is 640 clouds/sec — DGCNN-1024
fwd+bwd at batch 32 ≈ 20 it/s on V100-era PyTorch, *excluding* the
reference's CPU label-generation stalls, so it is a generous baseline.
The driver's north star is >=5x that, i.e. `vs_baseline` is reported
against 5 * 640 = 3200 clouds/sec/chip.

Prints exactly one JSON line.
"""

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

V100_ESTIMATE_CLOUDS_PER_SEC = 640.0
TARGET = 5.0 * V100_ESTIMATE_CLOUDS_PER_SEC


def main() -> None:
    from mlsp_tpu.utils.cache import enable as _enable_cache

    _enable_cache()
    from mlsp_tpu.models import DGCNN
    from mlsp_tpu.train import create_train_state, steps
    from mlsp_tpu.utils.config import PointDAConfig

    B, N = 32, 1024
    cfg = PointDAConfig(
        batch_size=B, num_points=N, synthetic=True,
        Density_normal_viainput=True, Normal_ondef=True, Density_ondef=True,
        radius=0.135,
    )
    model = DGCNN(num_classes=10, k=20, knn_backend="auto")
    sample = jnp.zeros((B, N, 3), jnp.float32)
    state = create_train_state(
        model, jax.random.key(0), sample, epochs=150, steps_per_epoch=100,
        heads=("defrec", "normal", "scan", "density"),
    )

    rng = np.random.default_rng(0)
    sx = jnp.asarray(rng.standard_normal((B, N, 3)), jnp.float32)
    sy = jnp.asarray(rng.integers(0, 10, B))
    tx = jnp.asarray(rng.standard_normal((B, N, 3)), jnp.float32)
    key = jax.random.key(1)

    # Warmup: compile + drain relay/dispatch warmup (the first timed loop
    # after compile still absorbs one-off costs through the TPU tunnel).
    for _ in range(12):
        key, k = jax.random.split(key)
        state, m = steps.pointda_train_step(state, sx, sy, tx, k, cfg)
    jax.block_until_ready(m["total"])

    # Timed steps (chained on state to serialize real dependency);
    # take the best of 3 trials to reject interference.
    iters = 50
    best_dt = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for i in range(iters):
            key, k = jax.random.split(key)
            state, m = steps.pointda_train_step(state, sx, sy, tx, k, cfg)
        jax.block_until_ready(m["total"])
        best_dt = min(best_dt, time.perf_counter() - t0)

    clouds_per_sec = iters * B / best_dt
    print(json.dumps({
        "metric": "clouds/sec/chip (DGCNN k=20, 1024 pts, full MLSP train step)",
        "value": round(clouds_per_sec, 1),
        "unit": "clouds/sec/chip",
        "vs_baseline": round(clouds_per_sec / TARGET, 3),
    }))


if __name__ == "__main__":
    main()
