"""Mixed-precision convergence A/B on the synthetic PointDA transfer.

Round-1 finding (CLAUDE.md): full compute_dtype=bf16 stalls DGCNN
convergence (78% vs 100% src val acc at epoch 11) because the dynamic
kNN graphs are built from rounded features. The two finer knobs dodge
that mechanism by construction:
  * head_dtype=bf16   — per-point heads only (most of the step FLOPs,
                        no kNN-graph dependency),
  * gather_dtype=bf16 — rounds only the gathered neighbour bytes in
                        EdgeConvM; the graph itself stays f32.
This script measures whether they also dodge it empirically: same
seeded synthetic modelnet->scannet transfer, paper recipe, per-variant
best source-val accuracy + final target accuracy + wall time.

Run on the TPU chip (one process at a time):
    python scripts/ab_mixed_precision.py [epochs] [seeds-csv] [variants-csv]
e.g. the round-3 multi-seed verdict run:
    python scripts/ab_mixed_precision.py 30 1,2,3 f32,head_bf16
"""

import json
import statistics
import sys
import time

from mlsp_tpu.utils.cache import enable as enable_cache

VARIANTS = {
    # explicit: the config DEFAULT is now head_dtype="bf16", so the f32
    # arm must force full-f32 heads to stay a real baseline
    "f32": {"head_dtype": "f32"},
    "head_bf16": {"head_dtype": "bf16"},
    "gather_bf16": {"gather_dtype": "bf16"},
    "head+gather_bf16": {"head_dtype": "bf16", "gather_dtype": "bf16"},
}


def main() -> None:
    enable_cache()
    import tempfile

    from mlsp_tpu.train import train_pointda
    from mlsp_tpu.utils.config import PointDAConfig

    epochs = int(sys.argv[1]) if len(sys.argv) > 1 else 11
    seeds = ([int(s) for s in sys.argv[2].split(",")]
             if len(sys.argv) > 2 else [1])
    names = (sys.argv[3].split(",") if len(sys.argv) > 3
             else list(VARIANTS))
    results = {}
    for name in names:
        kw = VARIANTS[name]
        per_seed = []
        for seed in seeds:
            with tempfile.TemporaryDirectory() as d:
                cfg = PointDAConfig(
                    synthetic=True, src_dataset="modelnet",
                    trgt_dataset="scannet", epochs=epochs, batch_size=32,
                    num_points=1024, test_batch_size=32, seed=seed,
                    out_path=d, exp_name=name,
                    Density_normal_viainput=True, Normal_ondef=True,
                    Density_ondef=True, scan_steps=8, **kw,
                )
                t0 = time.perf_counter()
                _, res = train_pointda(cfg)
                wall = time.perf_counter() - t0
            row = {
                "seed": seed,
                "best_src_val_acc": round(res["best"]["src_val_acc"], 4),
                "best_epoch": res["best"]["epoch"],
                "trgt_test_acc": round(res["test"]["acc"], 4),
                "wall_s": round(wall, 1),
            }
            per_seed.append(row)
            print(f"== {name} seed {seed}: {row}", flush=True)
        accs = [r["best_src_val_acc"] for r in per_seed]
        tgts = [r["trgt_test_acc"] for r in per_seed]
        results[name] = {
            "per_seed": per_seed,
            "src_val_mean": round(statistics.mean(accs), 4),
            "src_val_std": round(statistics.pstdev(accs), 4),
            "trgt_test_mean": round(statistics.mean(tgts), 4),
            "trgt_test_std": round(statistics.pstdev(tgts), 4),
        }
        print(f"=== {name}: src_val {results[name]['src_val_mean']}"
              f"+-{results[name]['src_val_std']}, trgt "
              f"{results[name]['trgt_test_mean']}"
              f"+-{results[name]['trgt_test_std']}", flush=True)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
