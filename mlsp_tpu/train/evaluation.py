"""Standalone checkpoint evaluation (`mlsp-tpu eval`).

The reference evaluates only inside its trainers (`test()` at
`PointDA/trainer.py:298-331`, `PointSegDA/trainer.py:239-270`) or by
loading `model.pt` into the SPST script (`train_spst.py:136-145`).
This gives that capability a first-class entry point: load a native
checkpoint (or a reference torch `model.pt` via the importer), run the
scanned eval program on any dataset split, report accuracy / balanced
accuracy / mIoU and the confusion matrix.
"""

from __future__ import annotations

import json

import jax
import jax.numpy as jnp

from mlsp_tpu.utils import checkpoint
from mlsp_tpu.utils.config import EvalConfig
from mlsp_tpu.utils.logging import IOStream


def _load_weights(cfg: EvalConfig, state, io: IOStream):
    """Native msgpack checkpoint, or reference torch state_dict."""
    state = checkpoint.load_model_weights(
        state, cfg.model_file, cfg.model, cfg.from_torch, cfg.pergroup)
    io.cprint(
        f"loaded {cfg.model_file}"
        + (" (reference torch state_dict)" if cfg.from_torch else ""))
    return state


def run_eval(cfg: EvalConfig, io: IOStream | None = None) -> dict:
    """Evaluate a checkpoint on one dataset split; returns the metrics
    dict (also printed as a single JSON line for scripting)."""
    cfg = cfg.resolved()  # task-conditional defaults (seg: 8 cls / 2048 pts)
    io = io or IOStream(cfg.out_path, cfg.exp_name)
    key = jax.random.key(cfg.seed)

    from mlsp_tpu.train.state import create_train_state

    if cfg.task == "pointsegda":
        from mlsp_tpu.data.pointsegda import load_pointsegda
        from mlsp_tpu.models import DGCNNSeg
        from mlsp_tpu.train.pointsegda_trainer import evaluate_seg

        from mlsp_tpu.utils.config import seg_model_heads

        ds = load_pointsegda(cfg.dataset, cfg.dataroot, cfg.split,
                             cfg.synthetic, cfg.num_points)
        if cfg.model == "dgcnn_seg":
            model = DGCNNSeg(num_classes=cfg.num_class, dropout=cfg.dropout,
                             density_num_cls=cfg.density_num_class,
                             pergroup=cfg.pergroup,
                             knn_backend=cfg.knn_backend)
        else:
            from mlsp_tpu.models import make_model

            model = make_model(cfg.model, cfg.num_class, dropout=cfg.dropout)
        sample = jnp.zeros(
            (min(cfg.test_batch_size, len(ds.data)),) + ds.data.shape[1:],
            jnp.float32)
        state = create_train_state(
            model, key, sample, heads=seg_model_heads(cfg.model))
        state = _load_weights(cfg, state, io)
        loss, miou, acc = evaluate_seg(state, ds.data, ds.label,
                                       cfg.test_batch_size)
        result = {"dataset": cfg.dataset, "split": cfg.split,
                  "loss": round(float(loss), 6), "miou": round(float(miou), 6),
                  "acc": round(float(acc), 6)}
        io.cprint(json.dumps(result))
        return result

    from mlsp_tpu.data import idx_to_label, load_pointda
    from mlsp_tpu.models import make_model
    from mlsp_tpu.train.pointda_trainer import evaluate
    from mlsp_tpu.utils.config import dgcnn_dtype_kwargs, model_heads

    partition = "train" if cfg.split in ("train", "val") else "test"
    ds = load_pointda(cfg.dataset, cfg.dataroot, partition,
                      cfg.num_points, cfg.synthetic, cfg.seed)
    indices = {"train": ds.train_ind, "val": ds.val_ind}.get(cfg.split)
    model = make_model(
        cfg.model, cfg.num_class, dropout=cfg.dropout,
        **(dict(density_num_cls=cfg.density_num_class, pergroup=cfg.pergroup,
                knn_backend=cfg.knn_backend, **dgcnn_dtype_kwargs(cfg))
           if cfg.model == "dgcnn" else {}),
    )
    sample = jnp.zeros((cfg.test_batch_size, cfg.num_points, 3), jnp.float32)
    state = create_train_state(model, key, sample,
                               heads=model_heads(cfg.model))
    state = _load_weights(cfg, state, io)

    r = evaluate(state, ds.data, ds.label, cfg.test_batch_size,
                 cfg.num_class, indices)
    io.cprint("Confusion matrix:\n" + str(r["conf_mat"]))
    io.save_conf_mat(r["conf_mat"], "eval_conf_mat.csv", "Eval",
                     class_names=[idx_to_label.get(i, str(i))
                                  for i in range(cfg.num_class)])
    result = {"dataset": cfg.dataset, "split": cfg.split,
              "acc": round(float(r["acc"]), 6),
              "balanced_acc": round(float(r["balanced_acc"]), 6),
              "loss": round(float(r["loss"]), 6)}
    io.cprint(json.dumps(result))
    return result
