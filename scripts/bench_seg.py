"""PointSegDA workload benchmark (companion to the headline bench.py).

Full seg train step — DGCNN_DefRec analog (DGCNNSeg), 2048 points,
batch 16, source seg CE + the full target SSL recipe (deform + normals
+ density on the deformed input) — measured with the same scanned
multi-step + forced-fetch protocol as bench.py.

Run on the TPU chip: python scripts/bench_seg.py
Prints one JSON line.
"""

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

from mlsp_tpu.utils.cache import enable as enable_cache


def main() -> None:
    enable_cache()
    from mlsp_tpu.models import DGCNNSeg
    from mlsp_tpu.train import create_train_state, seg_steps
    from mlsp_tpu.utils.config import PointSegDAConfig

    B, N, S = 16, 2048, 8
    cfg = PointSegDAConfig(
        batch_size=B, num_points=N, synthetic=True,
        DefRec_on_trgt=False, Density_normal_viainput=True,
        Normal_ondef=True, Density_ondef=True,
    ).resolved()
    model = DGCNNSeg(num_classes=cfg.num_class, knn_backend="auto")
    state = create_train_state(
        model, jax.random.key(0), jnp.zeros((B, N, 3), jnp.float32),
        epochs=200, steps_per_epoch=100,
        heads=("seg", "defrec", "normal", "density"),
    )

    rng = np.random.default_rng(0)
    sxs = jnp.asarray(rng.standard_normal((S, B, N, 3)), jnp.float32)
    sys_ = jnp.asarray(rng.integers(0, cfg.num_class, (S, B, N)))
    txs = jnp.asarray(rng.standard_normal((S, B, N, 3)), jnp.float32)
    key = jax.random.key(1)

    state, ms, _ = seg_steps.pointsegda_train_scan(state, sxs, sys_, txs, key, cfg)
    float(ms["total"][-1])  # compile + warm

    best = float("inf")
    for t in range(3):
        t0 = time.perf_counter()
        state, ms, _ = seg_steps.pointsegda_train_scan(
            state, sxs, sys_, txs, jax.random.fold_in(key, t), cfg
        )
        float(ms["total"][-1])
        best = min(best, time.perf_counter() - t0)

    clouds_per_sec = S * B / best
    print(json.dumps({
        "metric": "clouds/sec/chip (DGCNNSeg, 2048 pts, full seg+SSL step)",
        "value": round(clouds_per_sec, 1),
        "unit": "clouds/sec/chip",
        "t_step_ms": round(best / S * 1e3, 2),
    }))


if __name__ == "__main__":
    main()
