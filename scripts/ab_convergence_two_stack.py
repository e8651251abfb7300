"""Two-stack convergence A/B: the REFERENCE'S OWN torch trainer vs
mlsp_tpu, same synthetic dataset + split + initial weights, trained to
plateau, comparing final/best source-val and target-test accuracy.

This is the accuracy-parity capstone attainable without the real
PointDA datasets (absent from the image — no egress): the trajectory
differentials prove step-level equivalence over a few iterations; this
proves the two stacks LAND in the same place after full training.

Recipes (6th CLI arg):
  * `pcm_defrec` — PCM mixup on source + DefRec on target
    (`trainer.py:396-407,463-475`), the reference's core recipe that
    is fully runnable in this image without label injection.
  * `viainput` — the PAPER's method (train.sh: PCM +
    Density_normal_viainput + Normal_ondef + Density_ondef,
    `trainer.py:522-566`). The reference generates its normal/density
    labels with python-pcl (absent here); the torch side instead
    consumes labels computed by OUR ops (`ops.estimate_normals`,
    `ops.density_labels`) on torch's OWN augmented batches — those ops
    are differentially proven against the pcl semantics
    (tests/test_ops.py oracles + the viainput trajectory test), so the
    injection preserves the reference's exact loss inputs.
Both stacks:
  * identical clouds/labels/splits (our synthetic loader, same seed;
    the torch side consumes the same arrays through the reference's own
    augment fns `pc_utils.jitter_pointcloud(random_rotate_one_axis(z))`
    per train item, exactly like `data/dataloader.py:92-93`),
  * identical INITIAL WEIGHTS (the trainer's own init, reconstructed
    and exported with `utils.torch_export.export_dgcnn`),
  * the reference's optimizer/schedule (Adam lr 1e-3 wd 5e-5 +
    CosineAnnealingLR per epoch, `trainer.py:258-260,574`), drop_last
    train batching, model selection on best source-val accuracy
    (`trainer.py:583-589`), final target-test with the best model.
Dropout (0.5) and shuffle orders use each stack's own RNG — this is a
CONVERGENCE comparison (where the stacks land), not a bit-exact one
(the trajectory suite covers that).

N MUST BE 1024 (the reference's own operating point) for any recipe
with DefRec: `mlsp.deform_input` only deforms voxel regions holding
>= 40 points (`mlsp.py:27,41`), and when NO region of a cloud
qualifies the mask is all-zero and the reference's own
`reconstruction_loss` divides 0/0 -> NaN, which one `backward()`
propagates into every weight (measured: at N=256 on the synthetic
target ~40% of clouds don't qualify and torch's val accuracy freezes
at chance from epoch 0; our `defrec_loss` guards the empty mask — a
documented delta, PARITY.md). At N=1024 the worst synthetic cloud's
best region holds 54 points over 30 random-rotation trials.

`max_train` subsamples the train split SYMMETRICALLY (ours via a
wrapped loader around the production trainer, torch directly) to keep
the torch side's CPU budget sane at N=1024.

Run (ours on the TPU chip, torch on this CPU — torch is the slow side):
    PYTHONPATH=.:$PYTHONPATH python scripts/ab_convergence_two_stack.py \
        [epochs] [seeds-csv] [num_points] [batch] [max_train] [recipe]
Round-4 verdict run: epochs=12 seeds=1,2 num_points=1024 batch=16
max_train=128 (~3 h, almost all of it torch). Round-5 adds
`... 128 viainput` for the paper recipe.
"""

import json
import os
import statistics
import sys
import tempfile
import time


def _ours(cfg, datasets):
    """Run the PRODUCTION trainer, its loader wrapped to serve the A/B's
    (possibly train-subsampled) datasets so both stacks see identical
    data."""
    import mlsp_tpu.train.pointda_trainer as PT
    from mlsp_tpu.train import train_pointda

    src, trgt, trgt_test = datasets
    table = {("modelnet", "train"): src, ("scannet", "train"): trgt,
             ("scannet", "test"): trgt_test}

    def fake_load(name, dataroot, partition, *a, **k):
        return table[(name, partition)]

    orig = PT.load_pointda
    PT.load_pointda = fake_load
    t0 = time.perf_counter()
    try:
        _, res = train_pointda(cfg)
    finally:
        PT.load_pointda = orig
    return {
        "best_src_val_acc": round(res["best"]["src_val_acc"], 4),
        "best_epoch": res["best"]["epoch"],
        "trgt_test_acc": round(res["test"]["acc"], 4),
        "wall_s": round(time.perf_counter() - t0, 1),
    }


def _export_trainer_init(cfg):
    """Reconstruct train_pointda's exact init (same key derivation,
    `pointda_trainer.py:81,103`) and export it as a reference
    state_dict."""
    import jax
    import jax.numpy as jnp

    from mlsp_tpu.models import DGCNN
    from mlsp_tpu.train.state import create_train_state
    from mlsp_tpu.utils.config import validate_heads
    from mlsp_tpu.utils.torch_export import export_dgcnn

    key = jax.random.key(cfg.seed)
    _, init_key = jax.random.split(key)
    model = DGCNN(num_classes=cfg.num_class, dropout=cfg.dropout,
                  density_num_cls=cfg.density_num_class,
                  pergroup=cfg.pergroup)
    state = create_train_state(
        model, init_key,
        jnp.zeros((cfg.batch_size, cfg.num_points, 3), jnp.float32),
        heads=validate_heads(cfg))
    return export_dgcnn({"params": state.params,
                         "batch_stats": state.batch_stats},
                        pergroup=cfg.pergroup)


def _torch(cfg, datasets, init_sd, log):
    """The reference's own training loop (`PointDA/trainer.py:341-611`),
    PCM + DefRec_on_trgt and/or Density_normal_viainput branches
    (`trainer.py:463-475,522-566`), driven by the reference's own
    modules. For viainput the pcl-generated labels are replaced by our
    differentially-proven ops on torch's own batches (see module
    docstring)."""
    import numpy as np
    import torch
    import torch.nn.functional as F

    sys.path.insert(0, "scripts")
    from bench_vs_torch_cpu import _stub_reference_deps

    _stub_reference_deps()
    from types import SimpleNamespace

    import MLSP.mlsp as mlsp
    import MLSP.PCM as PCM
    import utils.pc_utils as pc_utils
    from PointDA import Models as refM

    src, trgt, trgt_test = datasets
    torch.manual_seed(cfg.seed)
    np.random.seed(cfg.seed)
    args = SimpleNamespace(
        num_class=10, dropout=cfg.dropout, model="dgcnn", encoder_type="",
        cuda=False, density_num_class=cfg.density_num_class,
        pergroup=cfg.pergroup, gpus=[-1], DefRec_weight=cfg.DefRec_weight,
        mixup_params=cfg.mixup_params, num_regions=cfg.num_regions,
        DefRec_dist=cfg.DefRec_dist,
        normal_pred_weight=cfg.normal_pred_weight,
        Density_weight=cfg.Density_weight,
        Density_normal_defpart=cfg.Density_normal_defpart,
    )

    labels_fn = None
    if cfg.Density_normal_viainput:
        # Label injection (trainer.py:524-538 uses pcl; our ops are
        # oracle/differential-proven equal — tests/test_ops.py,
        # TestTrajectory viainput). jitted once; runs per torch batch.
        import jax
        import jax.numpy as jnp

        from mlsp_tpu import ops as jops

        @jax.jit
        def _labels(x):
            ngt = jops.estimate_normals(x, cfg.near)
            dvec, dval = jops.density_labels(
                x, cfg.radius, cfg.density_num_class, cfg.pergroup)
            return ngt, dvec, dval

        def labels_fn(batch_bn3):
            ngt, dvec, dval = _labels(jnp.asarray(batch_bn3))
            return (np.asarray(ngt), np.asarray(dvec), np.asarray(dval))
    model = refM.DGCNN(args)
    missing, unexpected = model.load_state_dict(
        {k: torch.from_numpy(np.array(v)) for k, v in init_sd.items()},
        strict=False)
    assert not unexpected, unexpected
    assert all(m.endswith("num_batches_tracked") for m in missing), missing
    opt = torch.optim.Adam(model.parameters(), lr=cfg.lr,
                           weight_decay=cfg.wd)
    scheduler = torch.optim.lr_scheduler.CosineAnnealingLR(opt, cfg.epochs)
    criterion = torch.nn.CrossEntropyLoss()
    lookup = torch.Tensor(pc_utils.region_mean(args.num_regions))
    device = torch.device("cpu")

    def augment(batch):  # dataloader.py:92-93, per item
        return np.stack([
            pc_utils.jitter_pointcloud(
                pc_utils.random_rotate_one_axis(c.copy(), "z"))
            for c in batch]).astype(np.float32)

    @torch.no_grad()
    def evaluate(data, labels):  # trainer.py:296-331
        model.eval()
        correct = n = 0
        for s in range(0, len(data), cfg.test_batch_size):
            x = torch.from_numpy(
                np.swapaxes(data[s:s + cfg.test_batch_size], 1, 2))
            logits = model(x, activate_DefRec=False)
            pred = logits["cls"].max(dim=1)[1].numpy()
            correct += (pred == labels[s:s + cfg.test_batch_size]).sum()
            n += len(pred)
        model.train()
        return correct / n

    shuffler = np.random.default_rng(cfg.seed)
    best = {"src_val_acc": 0.0, "epoch": -1,
            "sd": {k: v.clone() for k, v in model.state_dict().items()}}
    t0 = time.perf_counter()
    n_iter = min(len(src.train_ind), len(trgt.train_ind)) // cfg.batch_size
    for epoch in range(cfg.epochs):
        model.train()
        si = np.array(src.train_ind, copy=True)
        ti = np.array(trgt.train_ind, copy=True)
        shuffler.shuffle(si)
        shuffler.shuffle(ti)
        for b in range(n_iter):
            sb = si[b * cfg.batch_size:(b + 1) * cfg.batch_size]
            tb = ti[b * cfg.batch_size:(b + 1) * cfg.batch_size]
            sx = torch.from_numpy(
                np.swapaxes(augment(src.data[sb]), 1, 2))
            sy = torch.from_numpy(src.label[sb])
            ta = augment(trgt.data[tb])  # [B, N, 3] for label gen
            tx = torch.from_numpy(np.swapaxes(ta, 1, 2))
            opt.zero_grad()
            # PCM on source (trainer.py:396-403)
            mixed, mixup_vals = PCM.mix_shapes(args, sx.clone(), sy)
            loss_s = PCM.calc_loss(args, model(mixed, activate_DefRec=False),
                                   mixup_vals, criterion)
            loss_s.backward()
            if cfg.DefRec_on_trgt:
                # DefRec on target (trainer.py:463-475)
                dx, mask = mlsp.deform_input(tx.clone(), lookup,
                                             args.DefRec_dist, device)
                loss_t = mlsp.calc_loss(
                    args, model(dx, activate_DefRec=True), tx, mask)
                loss_t.backward()
            if cfg.Density_normal_viainput:
                # the paper branch (trainer.py:522-566): deform, DefRec
                # + masked normal + masked density losses on the
                # deformed forward; labels from the UNdeformed batch
                ngt, dvec, dval = labels_fn(ta)
                dx, mask = mlsp.deform_input(tx.clone(), lookup,
                                             args.DefRec_dist, device)
                lp = model(dx, activate_density_normal_ondef=True)
                loss_t = mlsp.calc_loss(args, lp, tx, mask)
                # trainer.py:548-551 (defpart False -> mask*26+1)
                mask_cord = mask.permute(0, 2, 1)[:, :, 0]
                if not args.Density_normal_defpart:
                    mask_cord = mask_cord * 26 + 1
                if cfg.Normal_ondef:  # trainer.py:552-559
                    npred = F.normalize(lp["Normal"], p=2, dim=-1)
                    ngt_t = F.normalize(torch.from_numpy(ngt), p=2, dim=-1)
                    loss_t = loss_t + args.normal_pred_weight * (
                        -torch.sum(torch.abs(torch.sum(
                            npred * ngt_t, dim=-1)) * mask_cord)
                        / torch.sum(mask_cord))
                if cfg.Density_ondef:  # trainer.py:560-566
                    dcls, dmse = mlsp.densityloss(
                        args, lp,
                        torch.from_numpy(dval.reshape(-1).astype(np.float32)),
                        torch.from_numpy(dvec.reshape(
                            -1, cfg.density_num_class).astype(np.float32)),
                        mask=mask_cord.reshape(-1))
                    loss_t = loss_t + dcls + dmse
                loss_t.backward()
            opt.step()
        scheduler.step()
        src_val = evaluate(src.data[src.val_ind], src.label[src.val_ind])
        if src_val > best["src_val_acc"]:  # trainer.py:583-589
            best.update(src_val_acc=float(src_val), epoch=epoch,
                        sd={k: v.clone()
                            for k, v in model.state_dict().items()})
        log(f"  torch epoch {epoch}: src_val {src_val:.4f} "
            f"(best {best['src_val_acc']:.4f} @ {best['epoch']}) "
            f"[{time.perf_counter() - t0:.0f}s]")
    model.load_state_dict(best["sd"])
    test_acc = evaluate(trgt_test.data, trgt_test.label)
    return {
        "best_src_val_acc": round(best["src_val_acc"], 4),
        "best_epoch": best["epoch"],
        "trgt_test_acc": round(float(test_acc), 4),
        "wall_s": round(time.perf_counter() - t0, 1),
    }


def main():
    from mlsp_tpu.data.pointda import load_pointda
    from mlsp_tpu.utils.cache import enable as enable_cache
    from mlsp_tpu.utils.config import PointDAConfig

    enable_cache()
    epochs = int(sys.argv[1]) if len(sys.argv) > 1 else 12
    seeds = ([int(s) for s in sys.argv[2].split(",")]
             if len(sys.argv) > 2 else [1, 2])
    N = int(sys.argv[3]) if len(sys.argv) > 3 else 1024
    B = int(sys.argv[4]) if len(sys.argv) > 4 else 16
    max_train = int(sys.argv[5]) if len(sys.argv) > 5 else 128
    recipe = sys.argv[6] if len(sys.argv) > 6 else "pcm_defrec"
    # AB_SIDES=ours (or torch) runs one stack only — used to widen the
    # cheap side's seed count without re-paying ~100 min/seed of torch.
    sides = os.environ.get("AB_SIDES", "ours,torch").split(",")
    recipe_flags = {
        # trainer.py:463-475 (round-4 core recipe)
        "pcm_defrec": dict(DefRec_on_trgt=True),
        # the paper's train.sh recipe (trainer.py:522-566)
        "viainput": dict(Density_normal_viainput=True, Normal_ondef=True,
                         Density_ondef=True),
    }[recipe]

    def log(msg):
        print(msg, flush=True)

    rows = {"ours": [], "torch": []}
    for seed in seeds:
        with tempfile.TemporaryDirectory() as d:
            cfg = PointDAConfig(
                synthetic=True, src_dataset="modelnet",
                trgt_dataset="scannet", epochs=epochs, batch_size=B,
                num_points=N, test_batch_size=32, seed=seed, out_path=d,
                exp_name=f"ab2s_{recipe}_{seed}", apply_PCM=True,
                **recipe_flags,
            ).resolved()
            datasets = (
                load_pointda("modelnet", cfg.dataroot, "train", N, True, seed),
                load_pointda("scannet", cfg.dataroot, "train", N, True, seed),
                load_pointda("scannet", cfg.dataroot, "test", N, True, seed),
            )
            for d in datasets[:2]:  # symmetric train subsample
                d.train_ind = d.train_ind[:max_train]
            init_sd = _export_trainer_init(cfg)
            if "ours" in sides:
                ours = _ours(cfg, datasets)
                rows["ours"].append({"seed": seed, **ours})
                log(f"== ours  seed {seed}: {ours}")
            if "torch" in sides:
                th = _torch(cfg, datasets, init_sd, log)
                rows["torch"].append({"seed": seed, **th})
                log(f"== torch seed {seed}: {th}")

    out = {"recipe": recipe,
           "workload": f"PCM + {recipe} target SSL, modelnet->scannet "
                       f"synthetic, N={N} B={B} epochs={epochs} "
                       f"max_train={max_train}",
           "per_seed": rows}
    for side in ("ours", "torch"):
        if not rows[side]:
            continue
        sv = [r["best_src_val_acc"] for r in rows[side]]
        tt = [r["trgt_test_acc"] for r in rows[side]]
        out[side] = {
            "src_val_mean": round(statistics.mean(sv), 4),
            "src_val_std": round(statistics.pstdev(sv), 4),
            "trgt_test_mean": round(statistics.mean(tt), 4),
            "trgt_test_std": round(statistics.pstdev(tt), 4),
        }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
