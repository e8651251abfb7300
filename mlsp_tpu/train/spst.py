"""SPST: self-paced self-training with pseudo-labels.

Port of `PointDA/train_spst.py`: load a pretrained MLSP model, then for
each round select confident target samples (softmax-entropy below
threshold — `select_target_by_conf_v2`, `:239-281` — or max-prob above
threshold, `:284-313`), and fine-tune on pseudo-labeled target (weight
`spl_weight`) + source mixup/CE (weight `cls_weight`), both weights
decaying 5e-3 per epoch (`:499-500`). Best model tracked by source val
accuracy; best-test checkpointed separately (`:524-539`).
"""

from __future__ import annotations

import json
import os
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from mlsp_tpu import losses as L
from mlsp_tpu.data import batches, load_pointda
from mlsp_tpu.models import make_model
from mlsp_tpu.train import steps
from mlsp_tpu.train.pointda_trainer import evaluate
from mlsp_tpu.train.guard import check_finite_losses
from mlsp_tpu.train.state import (
    create_train_state, set_learning_rate, torch_cosine_lr,
)
from mlsp_tpu.train.steps import _apply, augment_batch, pcm_mix
from mlsp_tpu.transforms.augment import random_rotate_one_axis
from mlsp_tpu.utils import checkpoint
from mlsp_tpu.utils.average_meter import MeterDict
from mlsp_tpu.utils.config import SPSTConfig
from mlsp_tpu.utils.logging import IOStream
from mlsp_tpu.utils import metrics


def _spst_step_inner(state, t_x, t_y, s_x, s_y, spl_weight, cls_weight, key, cfg):
    """One SPST iteration (`train_spst.py:472-498`).

    Pseudo-labeled target gets z-rotation only (`DataLoad.__getitem__`,
    `:333-338`); source keeps the full loader augmentation.
    """
    keys = jax.random.split(key, 6)
    t_x = random_rotate_one_axis(keys[0], t_x, "z")
    s_x = augment_batch(keys[1], s_x)

    def loss_fn(params):
        bstats = state.batch_stats
        m = {}
        t_logits, bstats = _apply(state, params, bstats, t_x, (), keys[2])
        loss_t = spl_weight * L.cross_entropy(t_logits["cls"], t_y)
        m["trgt_cls"] = loss_t
        if cfg.apply_PCM:
            mixed, (ya, yb, lam) = pcm_mix(keys[3], s_x, s_y, cfg.mixup_params)
            s_logits, bstats = _apply(state, params, bstats, mixed, (), keys[4])
            loss_s = L.mixup_cross_entropy(
                s_logits["cls"], ya, yb, lam, cfg.DefRec_weight
            )
            m["src_mixup"] = loss_s
        else:
            s_logits, bstats = _apply(state, params, bstats, s_x, (), keys[4])
            loss_s = cls_weight * L.cross_entropy(s_logits["cls"], s_y)
            m["src_cls"] = loss_s
        total = loss_t + loss_s
        m["total"] = total
        return total, (m, bstats)

    grads, (m, bstats) = jax.grad(loss_fn, has_aux=True)(state.params)
    return state.apply_gradients(grads=grads).replace(batch_stats=bstats), m


@partial(jax.jit, static_argnames=("cfg",))
def spst_train_step(state, t_x, t_y, s_x, s_y, spl_weight, cls_weight, key, cfg):
    return _spst_step_inner(state, t_x, t_y, s_x, s_y, spl_weight, cls_weight,
                            key, cfg)


@partial(jax.jit, static_argnames=("cfg",))
def spst_train_scan(state, t_xs, t_ys, s_xs, s_ys, spl_weight, cls_weight,
                    key, cfg):
    """S SPST iterations as one device program (cf. pointda_train_scan)."""

    def body(carry, batch):
        state, key = carry
        key, k = jax.random.split(key)
        tx, ty, sx, sy = batch
        state, m = _spst_step_inner(state, tx, ty, sx, sy, spl_weight,
                                    cls_weight, k, cfg)
        return (state, key), m

    (state, _), ms = jax.lax.scan(body, (state, key), (t_xs, t_ys, s_xs, s_ys))
    return state, ms


def select_pseudo_labels(state, data, label, indices, batch_size, threshold,
                         use_entropy, io, epoch):
    """Confidence-gated target selection; returns (clouds, pseudo_labels).

    Entropy variant reproduces the reference's double-softmax quirk
    (`train_spst.py:258`): entropy of softmax(softmax(logits)).
    """
    from mlsp_tpu.data.pipeline import pad_batch

    # Padded batches run as scanned device programs of bounded chunk
    # size (cf. pointda_trainer.evaluate).
    stack_x, raw = [], []
    for bx, by in batches(data, label, batch_size, indices=indices):
        bx_p, _, n = pad_batch(bx, by, batch_size)
        stack_x.append(bx_p)
        raw.append((bx, by, n))
    pcs, plabels, tlabels = [], [], []
    if stack_x:
        all_logits = steps.scan_in_chunks(steps.eval_scan, state,
                                          stack_x)  # [S, B, C]
        for logits, (bx, by, n) in zip(all_logits, raw):
            conf = metrics.softmax_np(logits[:n])
            pred = conf.argmax(-1)
            if use_entropy:
                # entropy of softmax(softmax(logits)) — the reference's
                # double-softmax quirk (train_spst.py:258)
                ent = -(conf * metrics.log_softmax_np(conf)).sum(-1)
                keep = ent < threshold
            else:
                keep = conf.max(-1) > threshold
            pcs.append(bx[keep])
            plabels.append(pred[keep])
            tlabels.append(by[keep])
    pcs = np.concatenate(pcs) if pcs else np.zeros((0,) + data.shape[1:], data.dtype)
    plabels = np.concatenate(plabels) if plabels else np.zeros((0,), np.int64)
    tlabels = np.concatenate(tlabels) if tlabels else np.zeros((0,), np.int64)
    if len(plabels):
        io.print_progress("pseudo_label", "for_train", epoch, None, tlabels, plabels)
    io.cprint(f"pseudo label selection: {len(plabels)}/{len(indices)}")
    return pcs, plabels.astype(np.int64)


def train_spst(cfg: SPSTConfig, io: IOStream | None = None, initial_state=None,
               mesh=None):
    """SPST fine-tuning; with `mesh`, params replicate and batches shard
    over `data` like the other trainers (cf. `train_pointda`)."""
    from mlsp_tpu.parallel import (
        points_sharding, replicate_for_mesh, shard_batch, shard_scan_batch,
    )

    io = io or IOStream(cfg.out_path, cfg.exp_name)
    io.cprint(str(cfg))
    rng = np.random.default_rng(cfg.seed)
    key = jax.random.key(cfg.seed)

    src_train = load_pointda(cfg.src_dataset, cfg.dataroot, "train",
                             cfg.num_points, cfg.synthetic, cfg.seed)
    trgt_train = load_pointda(cfg.trgt_dataset, cfg.dataroot, "train",
                              cfg.num_points, cfg.synthetic, cfg.seed)
    trgt_test = load_pointda(cfg.trgt_dataset, cfg.dataroot, "test",
                             cfg.num_points, cfg.synthetic, cfg.seed)

    from mlsp_tpu.utils.config import dgcnn_dtype_kwargs

    model = make_model(
        cfg.model, cfg.num_class, dropout=cfg.dropout,
        **(dict(density_num_cls=cfg.density_num_class, pergroup=cfg.pergroup,
                knn_backend=cfg.knn_backend, **dgcnn_dtype_kwargs(cfg))
           if cfg.model == "dgcnn" else {}),
    )
    sample = jnp.zeros((cfg.batch_size, cfg.num_points, 3), jnp.float32)
    key, ik = jax.random.split(key)
    heads = ("defrec", "normal", "scan", "density") if cfg.model == "dgcnn" else ("defrec",)
    # The reference creates CosineAnnealingLR(T_max=epochs) ONCE and steps
    # it per epoch of every round (`train_spst.py:163,501`) — torch's
    # formula is cyclic, so with 2 rounds the LR rises back toward max in
    # round 2. An epoch-indexed injected LR reproduces that exactly (a
    # step-count schedule can't: SPST's per-epoch iteration count is the
    # selection size, which varies by round).
    # The SSL heads exist only for checkpoint compatibility with the
    # pretrain stage — the SPST loss trains cls alone
    # (`train_spst.py:472-498`), so torch's optimizer never touches
    # them (grad None).  untrained_heads masks our decay term to match.
    state = create_train_state(
        model, ik, sample, optimizer=cfg.optimizer, lr=cfg.lr, wd=cfg.wd,
        momentum=cfg.momentum, heads=heads, epoch_lr=True,
        untrained_heads=heads,
    )
    if initial_state is not None:
        state = state.replace(params=initial_state.params,
                              batch_stats=initial_state.batch_stats)
    elif cfg.model_file:
        # Native .ckpt, or the reference's own torch model.pt via
        # --from_torch (train_spst.py:136-143 loads torch state_dicts);
        # a missing file raises instead of silently training from scratch.
        state = checkpoint.load_model_weights(
            state, cfg.model_file, cfg.model, cfg.from_torch, cfg.pergroup)
        io.cprint(
            f"loaded pretrained model from {cfg.model_file}"
            + (" (reference torch state_dict)" if cfg.from_torch else ""))

    state = replicate_for_mesh(mesh, state, cfg.batch_size)

    with points_sharding(mesh):
        initial = evaluate(state, trgt_test.data, trgt_test.label,
                           cfg.test_batch_size, cfg.num_class)
    io.cprint(f"initial target test accuracy: {initial['acc']:.4f}")

    spl_weight, cls_weight = cfg.spl_weight, cfg.cls_weight
    best = {"src_val_acc": 0.0, "trgt_test_acc": 0.0, "epoch": -1, "state": state}
    curves = {"src_val_acc": [], "src_val_loss": [],
              "trgt_val_acc": [], "trgt_val_loss": []}

    io.trim_metrics(0)  # fresh run: truncate any prior metrics.jsonl
    for rnd in range(cfg.rounds):
        # Selection + evals share the train steps' points-sharding
        # context so nothing traces unconstrained mid-run (an
        # unconstrained trace would force a retrace on the next entry).
        with points_sharding(mesh):
            pcs, plabels = select_pseudo_labels(
                state, trgt_train.data, trgt_train.label, trgt_train.train_ind,
                cfg.test_batch_size, cfg.threshold, cfg.use_entropy_selection,
                io, rnd,
            )
        if len(pcs) < cfg.batch_size:
            # Degenerate round (selection smaller than one drop_last
            # batch). The reference still enters its epoch loop, decays
            # spl/cls and steps the scheduler once with zero batches,
            # then CRASHES on the 0-count loss division
            # (`train_spst.py:493-505`). We survive instead: apply the
            # per-epoch weight decay the epoch loop would have (all
            # cfg.epochs of it) and move to the next selection round.
            # The LR needs no bookkeeping — `torch_cosine_lr` is indexed
            # by the global epoch `rnd*epochs+epoch`, so later rounds
            # already see the advanced schedule. Weights are what the
            # epoch loop mutates, so only they must advance here.
            # Documented in PARITY.md (SPST degenerate rounds).
            io.cprint(f"round {rnd}: only {len(pcs)} confident samples "
                      f"(< batch_size {cfg.batch_size}); skipping train "
                      f"steps, advancing spl/cls weight decay")
            spl_weight -= cfg.weight_decay_per_epoch * cfg.epochs
            cls_weight -= cfg.weight_decay_per_epoch * cfg.epochs
            continue
        for epoch in range(cfg.epochs):
            lr = torch_cosine_lr(cfg.lr, cfg.epochs, rnd * cfg.epochs + epoch)
            state = set_learning_rate(state, lr)
            io.cprint(f"spl_weight: {spl_weight:.4f}, cls_weight: "
                      f"{cls_weight:.4f}, lr: {lr:.6f}")
            meters = MeterDict()
            t_iter = batches(pcs, plabels, cfg.batch_size, shuffle=True,
                             drop_last=True, rng=rng)
            s_iter = batches(src_train.data, src_train.label, cfg.batch_size,
                             indices=src_train.train_ind, shuffle=True,
                             drop_last=True, rng=rng)
            pairs = list(zip(t_iter, s_iter))
            S = max(cfg.scan_steps, 1)
            full = (len(pairs) // S) * S if S > 1 else 0
            for si in range(0, full, S):
                chunk = pairs[si : si + S]
                batch = (
                    np.stack([c[0][0] for c in chunk]),
                    np.stack([c[0][1] for c in chunk]),
                    np.stack([c[1][0] for c in chunk]),
                    np.stack([c[1][1] for c in chunk]),
                )
                txs, tys, sxs, sys_ = (
                    shard_scan_batch(mesh, batch) if mesh is not None
                    else jax.tree_util.tree_map(jnp.asarray, batch)
                )
                key, k = jax.random.split(key)
                with points_sharding(mesh):
                    state, ms = spst_train_scan(
                        state, txs, tys, sxs, sys_,
                        jnp.float32(spl_weight), jnp.float32(cls_weight), k, cfg,
                    )
                meters.update(jax.device_get(ms), n=cfg.batch_size)
            for (tx, ty), (sx, sy) in pairs[full:]:
                bs = tx.shape[0]
                batch = (tx, ty, sx, sy)
                tx, ty, sx, sy = (
                    shard_batch(mesh, batch) if mesh is not None
                    else jax.tree_util.tree_map(jnp.asarray, batch)
                )
                key, k = jax.random.split(key)
                with points_sharding(mesh):
                    state, m = spst_train_step(
                        state, tx, ty, sx, sy,
                        jnp.float32(spl_weight), jnp.float32(cls_weight), k, cfg,
                    )
                meters.update(jax.device_get(m), n=bs)
            spl_weight -= cfg.weight_decay_per_epoch
            cls_weight -= cfg.weight_decay_per_epoch
            io.print_progress("SPST", "Trn", rnd * cfg.epochs + epoch,
                              meters.averages())
            check_finite_losses(meters.averages(), state, rnd * cfg.epochs + epoch, io)

            with points_sharding(mesh):
                src_val = evaluate(state, src_train.data, src_train.label,
                                   cfg.test_batch_size, cfg.num_class,
                                   src_train.val_ind)
                trgt_val = evaluate(state, trgt_train.data, trgt_train.label,
                                    cfg.test_batch_size, cfg.num_class,
                                    trgt_train.val_ind)
                trgt_tst = evaluate(state, trgt_test.data, trgt_test.label,
                                    cfg.test_batch_size, cfg.num_class)
            for k_, v in (("src_val_acc", src_val["acc"]), ("src_val_loss", src_val["loss"]),
                          ("trgt_val_acc", trgt_val["acc"]), ("trgt_val_loss", trgt_val["loss"])):
                curves[k_].append(v)
            with open(os.path.join(io.path, "finetune_convergence.json"), "w") as f:
                json.dump(curves, f)
            io.log_metrics({
                "round": rnd, "epoch": rnd * cfg.epochs + epoch,
                "spl_weight": spl_weight, "cls_weight": cls_weight,
                "train": meters.averages(),
                "src_val": {"acc": src_val["acc"], "loss": src_val["loss"]},
                "trgt_val": {"acc": trgt_val["acc"], "loss": trgt_val["loss"]},
                "trgt_test": {"acc": trgt_tst["acc"], "loss": trgt_tst["loss"]},
            })

            if src_val["acc"] > best["src_val_acc"]:
                global_epoch = rnd * cfg.epochs + epoch
                best.update(src_val_acc=src_val["acc"],
                            epoch=global_epoch, state=state)
                checkpoint.save_train_state(
                    os.path.join(io.path, "model.ckpt"), state, global_epoch,
                    {"src_val_acc": src_val["acc"]})
                io.cprint(
                    f"== Best val model at epoch {best['epoch']}: src val "
                    f"{src_val['acc']:.4f}, trgt test {trgt_tst['acc']:.4f}")
                if trgt_tst["acc"] > best["trgt_test_acc"]:
                    best["trgt_test_acc"] = trgt_tst["acc"]
                    checkpoint.save_train_state(
                        os.path.join(io.path, "best_model.ckpt"), state,
                        rnd * cfg.epochs + epoch,
                        {"trgt_test_acc": trgt_tst["acc"]})

    with points_sharding(mesh):
        final = evaluate(best["state"], trgt_test.data, trgt_test.label,
                         cfg.test_batch_size, cfg.num_class)
    io.cprint(f"target test accuracy: {final['acc']:.4f}")
    return best["state"], {"initial": initial, "final": final,
                           "spl_weight": spl_weight, "cls_weight": cls_weight,
                           "best": {k_: v for k_, v in best.items() if k_ != "state"}}
