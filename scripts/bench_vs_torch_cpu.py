"""Same-hardware head-to-head: the REFERENCE'S OWN torch training
iteration vs our jitted step, both on this host's CPU.

The reference's GPU numbers live in BASELINE.md and can't be reproduced
in this image (no CUDA); what CAN be measured apples-to-apples is
framework efficiency on identical hardware. Both sides run the same
recipe subset — PCM mixup on source + DefRec on target + one Adam
update (`trainer.py:396-398,468-476`; the PCL-derived normal/density
branches are off because python-pcl is not in the image) — at the same
B=8, N=1024, k=20. The torch side drives the reference's own modules
(MLSP.PCM, MLSP.mlsp, PointDA.Models) exactly as its trainer does,
including the host-side deform/mixup data path; ours runs the
production `pointda_train_step` with the same flags, deform and PCM
inside the jit.

Run: PYTHONPATH=.:$PYTHONPATH python scripts/bench_vs_torch_cpu.py
"""

import json
import sys
import time
import types

import numpy as np


def _stub_reference_deps():
    for name in ("pcl", "wandb"):
        sys.modules.setdefault(name, types.ModuleType(name))
    knn_cuda = types.ModuleType("knn_cuda")
    knn_cuda.KNN = type("KNN", (), {"__init__": lambda self, *a, **k: None})
    sys.modules.setdefault("knn_cuda", knn_cuda)
    p2o = types.ModuleType("pointnet2_ops")
    p2o.pointnet2_utils = types.ModuleType("pointnet2_ops.pointnet2_utils")
    sys.modules.setdefault("pointnet2_ops", p2o)
    sys.modules.setdefault("pointnet2_ops.pointnet2_utils",
                           p2o.pointnet2_utils)
    try:
        import timm  # noqa: F401
    except ImportError:
        t = types.ModuleType("timm")
        tm, tl = types.ModuleType("timm.models"), types.ModuleType(
            "timm.models.layers")
        tl.DropPath, tl.trunc_normal_ = object, lambda *a, **k: None
        t.models, tm.layers = tm, tl
        sys.modules.update(
            {"timm": t, "timm.models": tm, "timm.models.layers": tl})
    for p in ("/root/reference", "/root/reference/PointDA"):
        if p not in sys.path:
            sys.path.insert(0, p)


def bench_torch(B, N, iters):
    import torch

    _stub_reference_deps()
    from types import SimpleNamespace

    import MLSP.mlsp as mlsp
    import MLSP.PCM as PCM
    import utils.pc_utils as pc_utils
    from PointDA import Models as refM

    torch.manual_seed(0)
    args = SimpleNamespace(
        num_class=10, dropout=0.5, model="dgcnn", encoder_type="",
        cuda=False, density_num_class=16, pergroup=2.0, gpus=[-1],
        DefRec_weight=0.5, mixup_params=1.0, num_regions=3,
        DefRec_dist="volume_based_voxels",
    )
    model = refM.DGCNN(args)
    model.train()
    opt = torch.optim.Adam(model.parameters(), lr=1e-3, weight_decay=5e-5)
    criterion = torch.nn.CrossEntropyLoss()
    lookup = torch.Tensor(pc_utils.region_mean(args.num_regions))
    device = torch.device("cpu")

    rng = np.random.default_rng(0)
    sx = torch.from_numpy(
        rng.standard_normal((B, 3, N)).astype(np.float32))
    sy = torch.from_numpy(rng.integers(0, 10, B).astype(np.int64))
    tx = torch.from_numpy(
        rng.standard_normal((B, 3, N)).astype(np.float32))

    def iteration():
        # trainer.py:341-574 with PCM on source, DefRec on target
        opt.zero_grad()
        src_data, mixup_vals = PCM.mix_shapes(args, sx.clone(), sy)
        src_logits = model(src_data, activate_DefRec=False)
        loss_s = PCM.calc_loss(args, src_logits, mixup_vals, criterion)
        loss_s.backward()
        trgt_data, trgt_mask = mlsp.deform_input(
            tx.clone(), lookup, args.DefRec_dist, device)
        trgt_logits = model(trgt_data, activate_DefRec=True)
        loss_t = mlsp.calc_loss(args, trgt_logits, tx, trgt_mask)
        loss_t.backward()
        opt.step()
        return float(loss_s.detach()) + float(loss_t.detach())

    iteration()  # warm
    best = float("inf")
    for _ in range(iters):
        t0 = time.perf_counter()
        iteration()
        best = min(best, time.perf_counter() - t0)
    return best


def bench_ours(B, N, iters):
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from mlsp_tpu.models import DGCNN
    from mlsp_tpu.train import create_train_state, steps
    from mlsp_tpu.utils.config import PointDAConfig

    cfg = PointDAConfig(
        batch_size=B, num_points=N, synthetic=True, apply_PCM=True,
        DefRec_on_trgt=True, Norm_on_trgt=False, Scan_on_trgt=False,
        Density_on_trgt=False, Density_normal_viainput=False,
    )
    model = DGCNN(num_classes=10, k=20, knn_backend="xla")
    state = create_train_state(
        model, jax.random.key(0), jnp.zeros((B, N, 3), jnp.float32),
        heads=("defrec",))
    rng = np.random.default_rng(0)
    sx = jnp.asarray(rng.standard_normal((B, N, 3)), jnp.float32)
    sy = jnp.asarray(rng.integers(0, 10, B))
    tx = jnp.asarray(rng.standard_normal((B, N, 3)), jnp.float32)
    key = jax.random.key(1)

    state, m = steps.pointda_train_step(state, sx, sy, tx, key, cfg)
    float(m["total"])  # compile + warm
    best = float("inf")
    for t in range(iters):
        t0 = time.perf_counter()
        state, m = steps.pointda_train_step(
            state, sx, sy, tx, jax.random.fold_in(key, t), cfg)
        float(m["total"])
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    B, N, iters = 8, 1024, 3
    t_ours = bench_ours(B, N, iters)
    t_torch = bench_torch(B, N, iters)
    print(json.dumps({
        "workload": "PCM + target DefRec + Adam step (B=8, N=1024, k=20)",
        "hardware": "this host's CPU, both frameworks",
        "torch_reference_s_per_iter": round(t_torch, 3),
        "mlsp_tpu_s_per_iter": round(t_ours, 3),
        "speedup": round(t_torch / t_ours, 2),
    }))


if __name__ == "__main__":
    main()
