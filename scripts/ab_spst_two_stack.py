"""Two-stack SPST-stage convergence A/B: the reference's second training
stage (pseudo-label self-training, `PointDA/train_spst.py:441-539`) run
by BOTH stacks from ONE shared pretrained checkpoint, comparing where
they land (final best-src-val model's target-test accuracy).

Composition (train.sh stage 2: `train_spst.py --round=2 --epochs=20
--threshold=1.5492`, scaled to this box):
  1. SHARED PRETRAIN — our production PointDA trainer (PCM + target
     DefRec) trains on the synthetic source/target; the best state is
     exported with `export_dgcnn` so both stacks fine-tune the SAME
     weights.
  2. Each stack runs `rounds` x `epochs` of selection + fine-tune:
       * selection: entropy-gated pseudo-labels
         (`select_target_by_conf_v2`, the double-softmax quirk). The
         torch side runs the REFERENCE'S OWN selector, extracted by ast
         from train_spst.py (module scope parses argv/loads ckpts, so it
         cannot be imported) — same mechanism as
         tests/test_torch_export.py::TestSPSTSelectionParity.
       * fine-tune: spl_weight * CE on pseudo-labeled targets + PCM
         mixup on source, spl/cls weights decaying 5e-3/epoch, Adam +
         the ONCE-constructed CosineAnnealingLR stepped across rounds
         (cyclic; ours reproduces it with the epoch-indexed injected
         LR). Model selection on best source-val accuracy.
Threshold: the paper's 0.95-max-prob 1.5492 and even the 0.9 equivalent
1.6365 (train_spst.py:240-242) are degenerate at this synthetic scale —
a measured entropy probe of the shared pretrained model on the 128
target-train clouds (round 5): 12-epoch pretrain selects 0/128 at
1.6365 (min entropy 1.80); 30-epoch pretrain (src_val 0.94, trgt_test
0.875) selects 2/128 at 1.6365, 36/128 at 1.9, 71/128 at 2.0. The
round-5 run therefore uses pre_epochs=30 with AB_SPST_THRESH=1.9: the
round-0 selection (identical weights on both stacks) is a nontrivial
strict subset, so the A/B actually exercises selection + fine-tune
rather than the documented degenerate-round divergence. The threshold
is shared by both stacks, so the comparison is unaffected by its value.

Data protocol is NORMALIZED across stacks so the comparison isolates
the training stack: selection and val/test run on raw (un-augmented)
clouds on both sides; fine-tune target batches get z-rotation only
(DataLoad.__getitem__, train_spst.py:333-338) and source batches the
full jitter+rotate, each stack drawing from its own RNG. (The
reference's own loaders also jitter at selection/val time — a loader
policy, not training math; the selector math itself is differentially
proven in TestSPSTSelectionParity.) N=512 is safe here (no DefRec in
the SPST loss, so the reference's small-N 0/0-NaN deform hazard does
not apply) and keeps the torch side ~4x cheaper than N=1024.

Run:
    PYTHONPATH=.:$PYTHONPATH python scripts/ab_spst_two_stack.py \
        [pre_epochs] [rounds] [epochs] [seeds-csv] [num_points] [batch] [max_train]
Round-5 run: AB_SPST_THRESH=1.9 ... 30 2 5 1,2 512 16 128.
"""

import json
import os
import statistics
import sys
import tempfile
import time
from types import SimpleNamespace


def _log(msg):
    print(msg, flush=True)


def _pretrain_and_export(cfg_pre, datasets):
    """Stage 1 on OUR stack; returns (best jax state, torch state_dict)."""
    import mlsp_tpu.train.pointda_trainer as PT
    from mlsp_tpu.train import train_pointda
    from mlsp_tpu.utils.torch_export import export_dgcnn

    src, trgt, trgt_test = datasets
    table = {("modelnet", "train"): src, ("scannet", "train"): trgt,
             ("scannet", "test"): trgt_test}

    def fake_load(name, dataroot, partition, *a, **k):
        return table[(name, partition)]

    orig = PT.load_pointda
    PT.load_pointda = fake_load
    try:
        state, res = train_pointda(cfg_pre)
    finally:
        PT.load_pointda = orig
    _log(f"  pretrain: best src_val {res['best']['src_val_acc']:.4f} @ "
         f"{res['best']['epoch']}, trgt_test {res['test']['acc']:.4f}")
    sd = export_dgcnn({"params": state.params,
                       "batch_stats": state.batch_stats},
                      pergroup=cfg_pre.pergroup)
    return state, sd


def _ours(cfg, datasets, pre_state):
    import mlsp_tpu.train.spst as SP
    from mlsp_tpu.train.spst import train_spst

    src, trgt, trgt_test = datasets
    table = {("modelnet", "train"): src, ("scannet", "train"): trgt,
             ("scannet", "test"): trgt_test}

    def fake_load(name, dataroot, partition, *a, **k):
        return table[(name, partition)]

    orig = SP.load_pointda
    SP.load_pointda = fake_load
    t0 = time.perf_counter()
    try:
        _, res = train_spst(cfg, initial_state=pre_state)
    finally:
        SP.load_pointda = orig
    return {
        "initial_trgt_test": round(res["initial"]["acc"], 4),
        "best_src_val_acc": round(res["best"]["src_val_acc"], 4),
        "best_epoch": res["best"]["epoch"],
        "trgt_test_acc": round(res["final"]["acc"], 4),
        "wall_s": round(time.perf_counter() - t0, 1),
    }


def _ref_selector(threshold):
    """The reference's own select_target_by_conf_v2, ast-extracted
    (train_spst.py's module scope parses argv and torch.loads files)."""
    import ast

    import numpy as np
    import torch

    src = open("/root/reference/PointDA/train_spst.py").read()
    fns = [n for n in ast.parse(src).body
           if isinstance(n, ast.FunctionDef)
           and n.name == "select_target_by_conf_v2"]
    assert len(fns) == 1
    ns = {
        "torch": torch, "nn": torch.nn, "np": np,
        "args": SimpleNamespace(threshold=threshold),
        "io": SimpleNamespace(print_progress=lambda *a, **k: 0.0,
                              cprint=lambda s: None),
        "device": torch.device("cpu"),
    }
    exec(compile(ast.Module(body=fns, type_ignores=[]),
                 "<ref train_spst.py selector>", "exec"), ns)
    return ns["select_target_by_conf_v2"]


def _torch(cfg, datasets, init_sd):
    """The reference's SPST loop (`train_spst.py:441-539`): selection
    rounds + self_train epochs, driven by the reference's own modules."""
    import numpy as np
    import torch

    sys.path.insert(0, "scripts")
    from bench_vs_torch_cpu import _stub_reference_deps

    _stub_reference_deps()
    import MLSP.PCM as PCM
    import utils.pc_utils as pc_utils
    from PointDA import Models as refM

    src, trgt, trgt_test = datasets
    torch.manual_seed(cfg.seed)
    np.random.seed(cfg.seed)
    args = SimpleNamespace(
        num_class=10, dropout=cfg.dropout, model="dgcnn", encoder_type="",
        cuda=False, density_num_class=16, pergroup=2.0, gpus=[-1],
        DefRec_weight=0.5, mixup_params=cfg.mixup_params,
        threshold=cfg.threshold,
    )
    model = refM.DGCNN(args)
    missing, unexpected = model.load_state_dict(
        {k: torch.from_numpy(np.array(v)) for k, v in init_sd.items()},
        strict=False)
    assert not unexpected, unexpected
    assert all(m.endswith("num_batches_tracked") for m in missing), missing
    opt = torch.optim.Adam(model.parameters(), lr=cfg.lr,
                           weight_decay=cfg.wd)
    # constructed ONCE, stepped per epoch across ALL rounds -> cyclic
    # (train_spst.py:163,501)
    scheduler = torch.optim.lr_scheduler.CosineAnnealingLR(opt, cfg.epochs)
    criterion = torch.nn.CrossEntropyLoss()
    select = _ref_selector(cfg.threshold)
    shuffler = np.random.default_rng(cfg.seed)

    @torch.no_grad()
    def evaluate(data, labels):
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

    t0 = time.perf_counter()
    initial = float(evaluate(trgt_test.data, trgt_test.label))
    spl_weight, cls_weight = 1.0, 1.0  # train_spst.py:33,35
    best = {"src_val_acc": 0.0, "epoch": -1,
            "sd": {k: v.clone() for k, v in model.state_dict().items()}}
    sel_counts = []
    for rnd in range(cfg.rounds):
        # selection loader: raw target train clouds, the reference's own
        # drop_last batching (train_spst.py:205)
        ti = np.array(trgt.train_ind, copy=True)
        loader = [(torch.from_numpy(trgt.data[ti[s:s + cfg.batch_size]]),
                   torch.from_numpy(trgt.label[ti[s:s + cfg.batch_size]]))
                  for s in range(0, len(ti) - cfg.batch_size + 1,
                                 cfg.batch_size)]
        pcs, plabels = select(loader, model, epoch=rnd)
        sel_counts.append(len(pcs))
        # selected clouds come back permuted [3, N] (selector stores
        # data.permute(0,2,1)[index]); keep [N, 3] here
        pcs = np.stack([np.asarray(p).T for p in pcs]) if pcs else \
            np.zeros((0, cfg.num_points, 3), np.float32)
        plabels = np.asarray(plabels, np.int64).reshape(-1)
        if len(pcs) < cfg.batch_size:
            # degenerate round: the reference would crash on the 0-count
            # division (documented divergence, PARITY.md); advance the
            # weight decay AND the cyclic LR schedule like its epoch
            # loop would, then continue. The scheduler steps too — our
            # stack indexes the LR by GLOBAL epoch (spst.py:
            # torch_cosine_lr(lr, epochs, rnd*epochs+epoch)), so a
            # skipped round must not leave the two stacks at different
            # cosine positions in later rounds (the A/B would then be
            # measuring harness LR skew, not the training stacks).
            spl_weight -= 5e-3 * cfg.epochs
            cls_weight -= 5e-3 * cfg.epochs
            for _ in range(cfg.epochs):
                scheduler.step()
            continue
        model.train()
        si_all = np.array(src.train_ind, copy=True)
        for epoch in range(cfg.epochs):
            order = np.arange(len(pcs))
            shuffler.shuffle(order)
            shuffler.shuffle(si_all)
            n_iter = min(len(order), len(si_all)) // cfg.batch_size
            for b in range(n_iter):
                tb = order[b * cfg.batch_size:(b + 1) * cfg.batch_size]
                sb = si_all[b * cfg.batch_size:(b + 1) * cfg.batch_size]
                # target: z-rotation only (DataLoad.__getitem__)
                t_np = np.stack([
                    pc_utils.random_rotate_one_axis(pcs[i].copy(), "z")
                    for i in tb]).astype(np.float32)
                t_x = torch.from_numpy(np.swapaxes(t_np, 1, 2))
                t_y = torch.from_numpy(plabels[tb])
                # source: full loader augmentation (dataloader.py:92-93)
                s_np = np.stack([
                    pc_utils.jitter_pointcloud(
                        pc_utils.random_rotate_one_axis(
                            src.data[i].copy(), "z"))
                    for i in sb]).astype(np.float32)
                s_x = torch.from_numpy(np.swapaxes(s_np, 1, 2))
                s_y = torch.from_numpy(src.label[sb])
                opt.zero_grad()
                t_logits = model(t_x, activate_DefRec=False)
                (spl_weight * criterion(t_logits["cls"], t_y)).backward()
                mixed, mixup_vals = PCM.mix_shapes(args, s_x.clone(), s_y)
                PCM.calc_loss(args, model(mixed, activate_DefRec=False),
                              mixup_vals, criterion).backward()
                opt.step()
            spl_weight -= 5e-3  # train_spst.py:499-500
            cls_weight -= 5e-3
            scheduler.step()
            src_val = evaluate(src.data[src.val_ind],
                               src.label[src.val_ind])
            if src_val > best["src_val_acc"]:
                best.update(src_val_acc=float(src_val),
                            epoch=rnd * cfg.epochs + epoch,
                            sd={k: v.clone()
                                for k, v in model.state_dict().items()})
            _log(f"  torch rnd {rnd} epoch {epoch}: src_val {src_val:.4f} "
                 f"(best {best['src_val_acc']:.4f} @ {best['epoch']}) "
                 f"[{time.perf_counter() - t0:.0f}s]")
    model.load_state_dict(best["sd"])
    test_acc = evaluate(trgt_test.data, trgt_test.label)
    return {
        "initial_trgt_test": round(initial, 4),
        "selected": sel_counts,
        "best_src_val_acc": round(best["src_val_acc"], 4),
        "best_epoch": best["epoch"],
        "trgt_test_acc": round(float(test_acc), 4),
        "wall_s": round(time.perf_counter() - t0, 1),
    }


def main():
    from mlsp_tpu.data.pointda import load_pointda
    from mlsp_tpu.utils.cache import enable as enable_cache
    from mlsp_tpu.utils.config import PointDAConfig, SPSTConfig

    enable_cache()
    pre_epochs = int(sys.argv[1]) if len(sys.argv) > 1 else 12
    rounds = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    epochs = int(sys.argv[3]) if len(sys.argv) > 3 else 5
    seeds = ([int(s) for s in sys.argv[4].split(",")]
             if len(sys.argv) > 4 else [1, 2])
    N = int(sys.argv[5]) if len(sys.argv) > 5 else 512
    B = int(sys.argv[6]) if len(sys.argv) > 6 else 16
    max_train = int(sys.argv[7]) if len(sys.argv) > 7 else 128
    # 0.9-max-prob entropy equivalent (train_spst.py:240); env override
    # exists for smoke runs (log(10)=2.303 selects everything so the
    # fine-tune loop is exercised even from a barely-trained ckpt)
    THRESH = float(os.environ.get("AB_SPST_THRESH", "1.6365"))

    rows = {"ours": [], "torch": []}
    for seed in seeds:
        with tempfile.TemporaryDirectory() as d:
            cfg_pre = PointDAConfig(
                synthetic=True, src_dataset="modelnet",
                trgt_dataset="scannet", epochs=pre_epochs, batch_size=B,
                num_points=N, test_batch_size=32, seed=seed, out_path=d,
                exp_name=f"abspst_pre_{seed}", apply_PCM=True,
                DefRec_on_trgt=True,
            ).resolved()
            datasets = (
                load_pointda("modelnet", cfg_pre.dataroot, "train", N, True,
                             seed),
                load_pointda("scannet", cfg_pre.dataroot, "train", N, True,
                             seed),
                load_pointda("scannet", cfg_pre.dataroot, "test", N, True,
                             seed),
            )
            for ds in datasets[:2]:  # symmetric train subsample
                ds.train_ind = ds.train_ind[:max_train]
            pre_state, init_sd = _pretrain_and_export(cfg_pre, datasets)
            cfg = SPSTConfig(
                synthetic=True, src_dataset="modelnet",
                trgt_dataset="scannet", rounds=rounds, epochs=epochs,
                batch_size=B, num_points=N, test_batch_size=32, seed=seed,
                out_path=d, exp_name=f"abspst_{seed}", apply_PCM=True,
                threshold=THRESH, use_entropy_selection=True,
            )
            ours = _ours(cfg, datasets, pre_state)
            rows["ours"].append({"seed": seed, **ours})
            _log(f"== ours  seed {seed}: {ours}")
            th = _torch(cfg, datasets, init_sd)
            rows["torch"].append({"seed": seed, **th})
            _log(f"== torch seed {seed}: {th}")

    out = {"recipe": "spst_stage",
           "workload": f"SPST stage (shared pretrain, entropy {THRESH}), "
                       f"modelnet->scannet synthetic, N={N} B={B} "
                       f"rounds={rounds} epochs={epochs} "
                       f"max_train={max_train}",
           "per_seed": rows}
    for side in ("ours", "torch"):
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
