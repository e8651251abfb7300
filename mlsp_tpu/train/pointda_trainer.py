"""PointDA-10 domain-adaptation trainer (the reference's main entry).

Orchestrates the epoch loop of `PointDA/trainer.py:341-611`: zip source
and target train streams, run the fused jitted step, validate on both
domains, keep the best model by *source* validation accuracy, final test
on target. All augmentation/label generation is inside the step.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np

from mlsp_tpu.data import batches, load_pointda
from mlsp_tpu.data.pipeline import pad_batch
from mlsp_tpu.models import make_model
from mlsp_tpu.train import steps
from mlsp_tpu.train.guard import check_finite_losses
from mlsp_tpu.train.state import create_train_state
from mlsp_tpu.utils import checkpoint, metrics
from mlsp_tpu.utils.average_meter import MeterDict
from mlsp_tpu.utils.config import PointDAConfig
from mlsp_tpu.utils.logging import IOStream


def evaluate(state, data, label, batch_size, num_classes, indices=None,
             chunk=None):
    """Eval loop: accuracy, balanced accuracy, mean CE loss, confusion.

    Batches (trailing one repetition-padded) run as scanned device
    programs of at most `chunk` (default `steps.EVAL_SCAN_CHUNK`) batches
    each, so device staging is bounded regardless of split size.
    """
    stack_x, stack_y, counts = [], [], []
    for bx, by in batches(data, label, batch_size, indices=indices):
        bx, by, n = pad_batch(bx, by, batch_size)
        stack_x.append(bx)
        stack_y.append(by)
        counts.append(n)
    if not stack_x:
        raise ValueError("evaluate: empty evaluation split")
    all_logits = steps.scan_in_chunks(steps.eval_scan, state, stack_x,
                                      chunk)  # [S, B, C]
    preds, trues, losses = [], [], []
    for logits, by, n in zip(all_logits, stack_y, counts):
        logits = logits[:n]
        p = logits.argmax(-1)
        logp = metrics.log_softmax_np(logits)
        losses.append(-logp[np.arange(n), by[:n]].sum())
        preds.append(p)
        trues.append(by[:n])
    preds, trues = np.concatenate(preds), np.concatenate(trues)
    total = float(np.sum(counts))
    return {
        "acc": metrics.accuracy(trues, preds),
        "balanced_acc": metrics.balanced_accuracy(trues, preds),
        "loss": float(np.sum(losses) / total),
        "conf_mat": metrics.confusion_matrix(trues, preds, num_classes),
    }


def train_pointda(cfg: PointDAConfig, io: IOStream | None = None, mesh=None):
    """Run the full DA training; returns (best_state, results dict).

    With `mesh` (a `parallel.make_mesh` result): parameters/optimizer
    state are replicated, every batch is sharded over the `data` axis
    (XLA all-reduces the gradients over ICI), and — if the mesh has a
    points axis > 1 — the O(N^2) distance intermediates are additionally
    partitioned over `points` (see `parallel.points_sharding`).
    """
    from mlsp_tpu.parallel import (
        points_sharding, replicate_for_mesh, shard_batch, shard_scan_batch,
    )

    cfg = cfg.resolved()
    io = io or IOStream(cfg.out_path, cfg.exp_name)
    io.cprint(str(cfg))
    key = jax.random.key(cfg.seed)

    src_train = load_pointda(cfg.src_dataset, cfg.dataroot, "train",
                             cfg.num_points, cfg.synthetic, cfg.seed)
    trgt_train = load_pointda(cfg.trgt_dataset, cfg.dataroot, "train",
                              cfg.num_points, cfg.synthetic, cfg.seed)
    trgt_test = load_pointda(cfg.trgt_dataset, cfg.dataroot, "test",
                             cfg.num_points, cfg.synthetic, cfg.seed)

    steps_per_epoch = min(
        len(src_train.train_ind), len(trgt_train.train_ind)
    ) // cfg.batch_size
    from mlsp_tpu.utils.config import dgcnn_dtype_kwargs

    model = make_model(
        cfg.model, cfg.num_class, dropout=cfg.dropout,
        **(dict(density_num_cls=cfg.density_num_class, pergroup=cfg.pergroup,
                knn_backend=cfg.knn_backend, **dgcnn_dtype_kwargs(cfg))
           if cfg.model == "dgcnn" else {}),
    )
    sample = jnp.zeros((cfg.batch_size, cfg.num_points, 3), jnp.float32)
    key, init_key = jax.random.split(key)
    from mlsp_tpu.utils.config import trained_heads, validate_heads

    all_heads = validate_heads(cfg)
    # Heads outside the recipe's loss get grad None in torch and are
    # skipped by its optimizer (`PointDA/trainer.py:571`) — freeze them
    # (decay mask) so they stay byte-identical here too.
    trained = trained_heads(cfg)
    state = create_train_state(
        model, init_key, sample,
        optimizer=cfg.optimizer, lr=cfg.lr, wd=cfg.wd, momentum=cfg.momentum,
        epochs=cfg.epochs, steps_per_epoch=steps_per_epoch, heads=all_heads,
        untrained_heads=tuple(h for h in all_heads if h not in trained),
    )

    state = replicate_for_mesh(mesh, state, cfg.batch_size)

    best = {"src_val_acc": 0.0, "epoch": -1, "state": state}
    ckpt_path = os.path.join(io.path, "model.ckpt")

    start_epoch = 0
    if cfg.resume:
        state, saved_epoch, saved_metrics = checkpoint.load_train_state(
            cfg.resume, state
        )
        start_epoch = saved_epoch + 1
        best["src_val_acc"] = float((saved_metrics or {}).get("src_val_acc", 0.0))
        best["state"] = state
        io.cprint(
            f"resumed from {cfg.resume} at epoch {saved_epoch} "
            f"(best src val acc {best['src_val_acc']:.4f})"
        )

    io.trim_metrics(start_epoch)  # drop records the loop will re-emit

    for epoch in range(start_epoch, cfg.epochs):
        meters = MeterDict()
        # Per-EPOCH streams derived from (seed, epoch), not consumed
        # sequentially across epochs: a `--resume` at epoch E then
        # reproduces the uninterrupted run's epoch-E shuffles and PRNG
        # keys exactly (preemption drill in tests/test_train_e2e.py).
        erng = np.random.default_rng(np.random.SeedSequence((cfg.seed, epoch)))
        ekey = jax.random.fold_in(key, epoch)
        src_iter = batches(src_train.data, src_train.label, cfg.batch_size,
                           indices=src_train.train_ind, shuffle=True,
                           drop_last=True, rng=erng)
        trgt_iter = batches(trgt_train.data, trgt_train.label, cfg.batch_size,
                            indices=trgt_train.train_ind, shuffle=True,
                            drop_last=True, rng=erng)
        if cfg.scan_steps > 1:
            # Stage chunks of the epoch and run them as single device
            # programs (lax.scan) — amortises per-dispatch overhead.
            pairs = list(zip(src_iter, trgt_iter))
            full = (len(pairs) // cfg.scan_steps) * cfg.scan_steps
            for s in range(0, full, cfg.scan_steps):
                chunk = pairs[s : s + cfg.scan_steps]
                batch = (
                    np.stack([c[0][0] for c in chunk]),
                    np.stack([c[0][1] for c in chunk]),
                    np.stack([c[1][0] for c in chunk]),
                )
                sxs, sys_, txs = (
                    shard_scan_batch(mesh, batch) if mesh is not None
                    else jax.tree_util.tree_map(jnp.asarray, batch)
                )
                ekey, k = jax.random.split(ekey)
                with points_sharding(mesh):
                    state, ms = steps.pointda_train_scan(
                        state, sxs, sys_, txs, k, cfg
                    )
                meters.update(jax.device_get(ms), n=cfg.batch_size)
            for (sx, sy), (tx, _) in pairs[full:]:  # tail: single steps
                batch = (sx, sy, tx)
                sx, sy, tx = (
                    shard_batch(mesh, batch) if mesh is not None
                    else jax.tree_util.tree_map(jnp.asarray, batch)
                )
                ekey, k = jax.random.split(ekey)
                with points_sharding(mesh):
                    state, m = steps.pointda_train_step(state, sx, sy, tx, k, cfg)
                meters.update(jax.device_get(m), n=batch[0].shape[0])
        else:
            for (sx, sy), (tx, _) in zip(src_iter, trgt_iter):
                n = sx.shape[0]
                batch = (sx, sy, tx)
                sx, sy, tx = (
                    shard_batch(mesh, batch) if mesh is not None
                    else jax.tree_util.tree_map(jnp.asarray, batch)
                )
                ekey, k = jax.random.split(ekey)
                with points_sharding(mesh):
                    state, m = steps.pointda_train_step(state, sx, sy, tx, k, cfg)
                meters.update(jax.device_get(m), n=n)

        io.print_progress("Source+Target", "Trn", epoch, meters.averages())
        check_finite_losses(meters.averages(), state, epoch, io)

        # Evals run under the same points-sharding context as the train
        # steps so nothing traces unconstrained mid-loop (which would
        # force a cache clear + retrace on the next step's entry).
        with points_sharding(mesh):
            src_val = evaluate(state, src_train.data, src_train.label,
                               cfg.test_batch_size, cfg.num_class,
                               src_train.val_ind)
            trgt_val = evaluate(state, trgt_train.data, trgt_train.label,
                                cfg.test_batch_size, cfg.num_class,
                                trgt_train.val_ind)
        io.cprint(
            f"Val - epoch {epoch}: src acc {src_val['acc']:.4f} "
            f"(bal {src_val['balanced_acc']:.4f}, loss {src_val['loss']:.4f}), "
            f"trgt acc {trgt_val['acc']:.4f} (loss {trgt_val['loss']:.4f})"
        )

        io.log_metrics({
            "epoch": epoch, "train": meters.averages(),
            "src_val": {k: src_val[k] for k in ("acc", "balanced_acc", "loss")},
            "trgt_val": {k: trgt_val[k] for k in ("acc", "balanced_acc", "loss")},
        })

        # Model selection by source val acc (trainer.py:589-596).
        if src_val["acc"] > best["src_val_acc"]:
            best.update(
                src_val_acc=src_val["acc"], src_val_loss=src_val["loss"],
                trgt_val_acc=trgt_val["acc"], trgt_val_loss=trgt_val["loss"],
                epoch=epoch, state=state, conf_mat=trgt_val["conf_mat"],
            )
            checkpoint.save_train_state(ckpt_path, state, epoch,
                                        {"src_val_acc": src_val["acc"]})

        # Periodic checkpoint (preemption tolerance): unlike model.ckpt
        # (best-by-src-val only), last.ckpt tracks wall-clock progress,
        # so `--resume last.ckpt` loses at most save_every-1 epochs.
        if cfg.save_every and (epoch + 1) % cfg.save_every == 0:
            checkpoint.save_train_state(
                os.path.join(io.path, "last.ckpt"), state, epoch,
                {"src_val_acc": best["src_val_acc"]})

    io.cprint(
        f"Best model found at epoch {best['epoch']}, "
        f"source val acc: {best['src_val_acc']:.4f}"
    )
    # reference prints the best epoch's TARGET-val confusion matrix
    # before the final test one (`trainer.py:601-602`)
    if "conf_mat" in best:  # no epoch ever beat the 0.0 init otherwise
        io.cprint("Best validation model confusion matrix:\n"
                  + str(best["conf_mat"]))
    with points_sharding(mesh):
        final = evaluate(best["state"], trgt_test.data, trgt_test.label,
                         cfg.test_batch_size, cfg.num_class)
    io.cprint(
        f"target test accuracy: {final['acc']:.4f}, "
        f"target test loss: {final['loss']:.4f}"
    )
    io.cprint("Test confusion matrix:\n" + str(final["conf_mat"]))
    from mlsp_tpu.data import idx_to_label

    io.save_conf_mat(final["conf_mat"], "test_conf_mat.csv", "Target",
                     class_names=[idx_to_label.get(i, str(i))
                                  for i in range(cfg.num_class)])
    return best["state"], {"best": {k_: v for k_, v in best.items() if k_ != "state"},
                           "test": final}
