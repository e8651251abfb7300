"""PointSegDA segmentation DA trainer.

Orchestrates `PointSegDA/trainer.py:282-511`: zip source/target
streams, fused seg+SSL step, per-epoch validation on both domains,
best model by *lowest source validation seg loss*, final target test.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np

from mlsp_tpu.data import batches, load_pointsegda
from mlsp_tpu.data.pipeline import pad_batch
from mlsp_tpu.models import DGCNNSeg
from mlsp_tpu.train import seg_steps
from mlsp_tpu.train.guard import check_finite_losses
from mlsp_tpu.train.state import create_train_state
from mlsp_tpu.utils import checkpoint, metrics
from mlsp_tpu.utils.average_meter import MeterDict
from mlsp_tpu.utils.config import PointSegDAConfig
from mlsp_tpu.utils.logging import IOStream

MAX_LOSS = 9e9


def evaluate_seg(state, data, label, batch_size, chunk=None):
    """Seg loss / mIoU / accuracy (averaged per sample, reference-style).

    Batches (trailing one repetition-padded) run as scanned device
    programs of bounded chunk size (cf. `pointda_trainer.evaluate`).
    """
    from mlsp_tpu.train.steps import scan_in_chunks

    stack_x, stack_y, counts = [], [], []
    for bx, by in batches(data, label, batch_size):
        bx, by, n = pad_batch(bx, by, batch_size)
        stack_x.append(bx)
        stack_y.append(by)
        counts.append(n)
    if not stack_x:
        raise ValueError("evaluate_seg: empty evaluation split")
    all_logits = scan_in_chunks(seg_steps.seg_eval_scan, state, stack_x,
                                chunk)  # [S, B, N, C]
    seg_loss = miou = acc = 0.0
    for logits, by, n in zip(all_logits, stack_y, counts):
        logits, by = logits[:n], by[:n]
        logp = metrics.log_softmax_np(logits)
        seg_loss += -np.take_along_axis(logp, by[..., None], -1).mean() * n
        preds = logits.argmax(-1)
        bm, ba = metrics.seg_metrics(by, preds)
        miou += bm
        acc += ba
    n_total = float(np.sum(counts))
    return seg_loss / n_total, miou / n_total, acc / n_total


def train_pointsegda(cfg: PointSegDAConfig, io: IOStream | None = None,
                     mesh=None):
    """Run the seg DA training; returns (best_state, results dict).

    With `mesh`: params replicated, batches sharded over `data`, points
    axis applied to the O(N^2) intermediates (cf. `train_pointda`).
    """
    from mlsp_tpu.parallel import (
        fetch_global, points_sharding, replicate_for_mesh, shard_batch,
        shard_scan_batch,
    )

    cfg = cfg.resolved()
    io = io or IOStream(cfg.out_path, f"{cfg.exp_name}_{cfg.src_dataset}_{cfg.trgt_dataset}")
    io.cprint(str(cfg))

    key = jax.random.key(cfg.seed)

    load = lambda name, part: load_pointsegda(name, cfg.dataroot, part,
                                              cfg.synthetic, cfg.num_points)
    src_train, src_val = load(cfg.src_dataset, "train"), load(cfg.src_dataset, "val")
    trgt_train, trgt_val = load(cfg.trgt_dataset, "train"), load(cfg.trgt_dataset, "val")
    trgt_test = load(cfg.trgt_dataset, "test")

    # batch = min(len(src), len(trgt), batch_size)  (trainer.py:184)
    bsz = min(len(src_train), len(trgt_train), cfg.batch_size)
    steps_per_epoch = min(len(src_train), len(trgt_train)) // bsz

    from mlsp_tpu.utils.config import validate_seg_heads

    all_heads = validate_seg_heads(cfg)
    if cfg.model == "dgcnn_seg":
        model = DGCNNSeg(
            num_classes=cfg.num_class, dropout=cfg.dropout,
            density_num_cls=cfg.density_num_class, pergroup=cfg.pergroup,
            knn_backend=cfg.knn_backend,
            dtype=jnp.bfloat16 if cfg.compute_dtype == "bf16" else None,
        )
    else:
        from mlsp_tpu.models import make_model

        model = make_model(cfg.model, cfg.num_class, dropout=cfg.dropout)
    N = src_train.data.shape[1]
    sample = jnp.zeros((bsz, N, 3), jnp.float32)
    key, ik = jax.random.split(key)
    base_key = key
    # torch grad-None parity: freeze heads the recipe's loss never reads
    # (cf. pointda_trainer; `PointSegDA/trainer.py:437` steps only what
    # got grads).
    from mlsp_tpu.utils.config import trained_seg_heads

    trained = trained_seg_heads(cfg)
    state = create_train_state(
        model, ik, sample, optimizer=cfg.optimizer, lr=cfg.lr, wd=cfg.wd,
        momentum=cfg.momentum, epochs=cfg.epochs, steps_per_epoch=steps_per_epoch,
        heads=all_heads,
        untrained_heads=tuple(h for h in all_heads if h not in trained),
    )

    from mlsp_tpu.utils.summary import model_summary

    io.cprint("\n" + model_summary(state.params))  # torchsummary parity

    state = replicate_for_mesh(mesh, state, bsz)

    best = {"src_val_loss": MAX_LOSS, "epoch": -1, "state": state}
    ckpt_path = os.path.join(io.path, "model.ckpt")

    io.trim_metrics(0)  # fresh run: truncate any prior metrics.jsonl
    for epoch in range(cfg.epochs):
        # per-epoch streams (cf. pointda_trainer: resume-exact semantics)
        rng = np.random.default_rng(np.random.SeedSequence((cfg.seed, epoch)))
        key = jax.random.fold_in(base_key, epoch)
        meters = MeterDict()
        src_iter = batches(src_train.data, src_train.label, bsz,
                           shuffle=True, drop_last=True, rng=rng)
        trgt_iter = batches(trgt_train.data, trgt_train.label, bsz,
                            shuffle=True, drop_last=True, rng=rng)
        pairs = list(zip(src_iter, trgt_iter))
        S = max(cfg.scan_steps, 1)
        full = (len(pairs) // S) * S if S > 1 else 0
        for s in range(0, full, S):
            chunk = pairs[s : s + S]
            batch = (
                np.stack([c[0][0] for c in chunk]),
                np.stack([c[0][1] for c in chunk]),
                np.stack([c[1][0] for c in chunk]),
            )
            sxs, sys_, txs = (
                shard_scan_batch(mesh, batch) if mesh is not None
                else jax.tree_util.tree_map(jnp.asarray, batch)
            )
            key, k = jax.random.split(key)
            with points_sharding(mesh):
                state, ms, (preds, mixed_y) = seg_steps.pointsegda_train_scan(
                    state, sxs, sys_, txs, k, cfg
                )
            meters.update(jax.device_get(ms), n=bsz)
            # preds/mixed_y are data-sharded on a multi-process cluster:
            # np.asarray on them would die on the non-addressable shards
            preds, mixed_y = fetch_global(preds), fetch_global(mixed_y)
            bm, _ = metrics.seg_metrics(
                np.asarray(mixed_y).reshape(-1, mixed_y.shape[-1]),
                np.asarray(preds).reshape(-1, preds.shape[-1]),
            )
            meters.update({"src_train_mIoU": bm / (S * bsz)}, n=S * bsz)
        for (sx, sy), (tx, _) in pairs[full:]:
            bs = sx.shape[0]
            batch = (sx, sy, tx)
            sx, sy, tx = (
                shard_batch(mesh, batch) if mesh is not None
                else jax.tree_util.tree_map(jnp.asarray, batch)
            )
            key, k = jax.random.split(key)
            with points_sharding(mesh):
                state, m, (preds, mixed_y) = seg_steps.pointsegda_train_step(
                    state, sx, sy, tx, k, cfg
                )
            meters.update(jax.device_get(m), n=bs)
            bm, _ = metrics.seg_metrics(
                np.asarray(fetch_global(mixed_y)),
                np.asarray(fetch_global(preds)))
            meters.update({"src_train_mIoU": bm / bs}, n=bs)

        io.print_progress("Source+Target", "Trn", epoch, meters.averages())
        check_finite_losses(meters.averages(), state, epoch, io)

        # Under the same points-sharding context as the train steps (an
        # unconstrained mid-loop trace would force a retrace next step).
        with points_sharding(mesh):
            src_val_loss, src_val_miou, src_val_acc = evaluate_seg(
                state, src_val.data, src_val.label, cfg.test_batch_size)
            trgt_val_loss, trgt_val_miou, trgt_val_acc = evaluate_seg(
                state, trgt_val.data, trgt_val.label, cfg.test_batch_size)
        io.cprint(
            f"Val - epoch {epoch}: src loss {src_val_loss:.4f} mIoU {src_val_miou:.4f} "
            f"acc {src_val_acc:.4f} | trgt loss {trgt_val_loss:.4f} "
            f"mIoU {trgt_val_miou:.4f} acc {trgt_val_acc:.4f}"
        )

        io.log_metrics({
            "epoch": epoch, "train": meters.averages(),
            "src_val": {"loss": src_val_loss, "mIoU": src_val_miou,
                        "acc": src_val_acc},
            "trgt_val": {"loss": trgt_val_loss, "mIoU": trgt_val_miou,
                         "acc": trgt_val_acc},
        })

        # Best by lowest source val seg loss (trainer.py:457-465).
        if src_val_loss < best["src_val_loss"]:
            best.update(
                src_val_loss=src_val_loss, src_val_miou=src_val_miou,
                trgt_val_loss=trgt_val_loss, trgt_val_miou=trgt_val_miou,
                trgt_val_acc=trgt_val_acc, epoch=epoch, state=state,
            )
            checkpoint.save_train_state(ckpt_path, state, epoch,
                                        {"src_val_loss": src_val_loss})

    io.cprint(f"Best model was found at epoch {best['epoch']}")
    with points_sharding(mesh):
        test_loss, test_miou, test_acc = evaluate_seg(
            best["state"], trgt_test.data, trgt_test.label,
            cfg.test_batch_size)
    io.cprint(
        f"target test seg loss: {test_loss:.4f}, target test seg mIOU: "
        f"{test_miou:.4f}, target test seg accuracy: {test_acc:.4f}"
    )
    return best["state"], {
        "best": {k_: v for k_, v in best.items() if k_ != "state"},
        "test": {"loss": test_loss, "mIoU": test_miou, "acc": test_acc},
    }
