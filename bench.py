"""Headline benchmark: full MLSP train-step throughput on one TPU chip.

Workload (BASELINE.md): DGCNN k=20, 1024 points, batch 32, the full
paper recipe — PCM mixup (on-device FPS), DefRec deformation, on-device
normal + cardinality ground-truth generation, all SSL heads, one
optimizer update per iteration. bf16 matmul compute, f32 params,
fused Pallas kNN.

Measurement protocol: S train steps are executed as ONE device program
(`lax.scan`) and timed with a forced value fetch at the end. Through the
remote-TPU relay in this environment, `block_until_ready` on dispatched
calls returns before execution finishes, so naive per-step timing
under-reports by orders of magnitude; the scan+fetch protocol measures
true device throughput.

Baseline for `vs_baseline`: the repo publishes no numbers (BASELINE.md);
the north star is 5x a V100-era PyTorch estimate of 640 clouds/sec, i.e.
3200 clouds/sec/chip on production silicon. Note the chip behind this
tunnel measures ~1.9 TFLOPS bf16 (~1% of a physical v5e), so absolute
numbers here are floor estimates.

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

    B, N, S = 32, 1024, 16
    cfg = PointDAConfig(
        batch_size=B, num_points=N, synthetic=True,
        Density_normal_viainput=True, Normal_ondef=True, Density_ondef=True,
        radius=0.135,
    )
    model = DGCNN(num_classes=10, k=20, knn_backend="auto")  # f32: bf16 is
    # ~13% faster on this chip but demonstrably degrades convergence
    sample = jnp.zeros((B, N, 3), jnp.float32)
    state = create_train_state(
        model, jax.random.key(0), sample, epochs=150, steps_per_epoch=100,
        heads=("defrec", "normal", "scan", "density"),
    )

    rng = np.random.default_rng(0)
    sxs = jnp.asarray(rng.standard_normal((S, B, N, 3)), jnp.float32)
    sys_ = jnp.asarray(rng.integers(0, 10, (S, B)))
    txs = jnp.asarray(rng.standard_normal((S, B, N, 3)), jnp.float32)
    key = jax.random.key(1)

    # Compile + warm.
    state, ms = steps.pointda_train_scan(state, sxs, sys_, txs, key, cfg)
    float(ms["total"][-1])

    best_dt = float("inf")
    for trial in range(3):
        t0 = time.perf_counter()
        state, ms = steps.pointda_train_scan(
            state, sxs, sys_, txs, jax.random.fold_in(key, trial), cfg
        )
        float(ms["total"][-1])  # forced fetch = true completion
        best_dt = min(best_dt, time.perf_counter() - t0)


    clouds_per_sec = S * B / best_dt
    print(json.dumps({
        "metric": "clouds/sec/chip (DGCNN k=20, 1024 pts, full MLSP train step)",
        "value": round(clouds_per_sec, 1),
        "unit": "clouds/sec/chip",
        "vs_baseline": round(clouds_per_sec / TARGET, 3),
    }))


if __name__ == "__main__":
    main()
