"""Standalone checkpoint evaluation + batch inference (`mlsp-tpu eval|infer`).

The reference evaluates only inside its trainers (`test()` at
`PointDA/trainer.py:298-331`, `PointSegDA/trainer.py:239-270`) or by
loading `model.pt` into the SPST script (`train_spst.py:136-145`), and
has no way to export predictions at all. This gives both capabilities
first-class entry points: load a native checkpoint (or a reference torch
`model.pt` via the importer), run the scanned eval program on any
dataset split, and either report metrics (`eval`) or write per-sample
predictions + class probabilities to an .npz (`infer` — the serving
surface: one scanned device program over the whole dataset).
"""

from __future__ import annotations

import json
import os

import jax
import jax.numpy as jnp
import numpy as np

from mlsp_tpu.utils import checkpoint, metrics
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


def _build_model(cfg: EvalConfig, knn_backend: str | None = None):
    """ONE model constructor for eval/infer/export/aot (three earlier
    copies had diverged — e.g. hengshuang_seg could never export).

    Returns (model, heads). `knn_backend` overrides the config's (the
    AOT path pins "xla" so bundles are platform-portable); every model
    family except PointNet (which has no kNN at all) accepts it.
    """
    from mlsp_tpu.models import make_model
    from mlsp_tpu.utils.config import (
        dgcnn_dtype_kwargs, model_heads, seg_model_heads,
    )

    kb = knn_backend or cfg.knn_backend
    kw = {} if cfg.model == "pointnet" else {"knn_backend": kb}
    if cfg.model == "dgcnn":
        kw.update(density_num_cls=cfg.density_num_class,
                  pergroup=cfg.pergroup, **dgcnn_dtype_kwargs(cfg))
        if knn_backend == "xla":
            # AOT bundles pin pure-XLA kernels so the lowered program is
            # platform-portable; the Pallas fused EdgeConv would not be.
            kw["edge_impl"] = "moments"
    elif cfg.model == "dgcnn_seg":
        kw.update(density_num_cls=cfg.density_num_class,
                  pergroup=cfg.pergroup)
    model = make_model(cfg.model, cfg.num_class, dropout=cfg.dropout, **kw)
    heads = (seg_model_heads(cfg.model) if cfg.task == "pointsegda"
             else model_heads(cfg.model))
    return model, heads


def _setup(cfg: EvalConfig, io: IOStream):
    """Dataset + model + weight-loaded state for one eval/infer run.

    Returns (state, data, label, indices): `indices` restricts to the
    train/val subsplit for classification (`dataloader.py:70-73`), None
    otherwise.
    """
    from mlsp_tpu.train.state import create_train_state

    key = jax.random.key(cfg.seed)
    model, heads = _build_model(cfg)
    if cfg.task == "pointsegda":
        from mlsp_tpu.data.pointsegda import load_pointsegda

        ds = load_pointsegda(cfg.dataset, cfg.dataroot, cfg.split,
                             cfg.synthetic, cfg.num_points)
        sample = jnp.zeros(
            (min(cfg.test_batch_size, len(ds.data)),) + ds.data.shape[1:],
            jnp.float32)
        state = create_train_state(model, key, sample, heads=heads)
        return _load_weights(cfg, state, io), ds.data, ds.label, None

    from mlsp_tpu.data import load_pointda

    partition = "train" if cfg.split in ("train", "val") else "test"
    ds = load_pointda(cfg.dataset, cfg.dataroot, partition,
                      cfg.num_points, cfg.synthetic, cfg.seed)
    indices = {"train": ds.train_ind, "val": ds.val_ind}.get(cfg.split)
    sample = jnp.zeros((cfg.test_batch_size, cfg.num_points, 3), jnp.float32)
    state = create_train_state(model, key, sample, heads=heads)
    return _load_weights(cfg, state, io), ds.data, ds.label, indices


def run_eval(cfg: EvalConfig, io: IOStream | None = None) -> dict:
    """Evaluate a checkpoint on one dataset split; returns the metrics
    dict (also printed as a single JSON line for scripting)."""
    cfg = cfg.resolved()  # task-conditional defaults (seg: 8 cls / 2048 pts)
    io = io or IOStream(cfg.out_path, cfg.exp_name)
    state, data, label, indices = _setup(cfg, io)

    if cfg.task == "pointsegda":
        from mlsp_tpu.train.pointsegda_trainer import evaluate_seg

        loss, miou, acc = evaluate_seg(state, data, label,
                                       cfg.test_batch_size)
        result = {"dataset": cfg.dataset, "split": cfg.split,
                  "loss": round(float(loss), 6), "miou": round(float(miou), 6),
                  "acc": round(float(acc), 6)}
        io.cprint(json.dumps(result))
        return result

    from mlsp_tpu.data import idx_to_label
    from mlsp_tpu.train.pointda_trainer import evaluate

    r = evaluate(state, data, label, cfg.test_batch_size,
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


def run_infer(cfg: EvalConfig, io: IOStream | None = None) -> dict:
    """Batch inference: write predictions for one dataset split to .npz.

    The whole split runs as ONE scanned device program (the serving
    protocol, cf. `bench.py`'s eval_clouds_per_sec). Output arrays:
      * classification: `pred` [M] int64, `prob` [M, num_class] f32
        (softmax), plus `label` [M] when the split has ground truth;
      * segmentation: `pred` [M, N] int64, `prob` [M, N, num_class] f32,
        plus `label` [M, N].
    Returns a summary dict (also printed as one JSON line).
    """
    from mlsp_tpu.data.pipeline import pad_batch
    from mlsp_tpu.train import seg_steps, steps

    cfg = cfg.resolved()
    io = io or IOStream(cfg.out_path, cfg.exp_name)
    state, data, label, indices = _setup(cfg, io)

    stack_x, stack_y, counts = [], [], []
    order = []  # dataset indices, in emitted order
    idx_all = np.arange(data.shape[0]) if indices is None else np.asarray(indices)
    for s in range(0, idx_all.shape[0], cfg.test_batch_size):
        sel = idx_all[s : s + cfg.test_batch_size]
        bx, by, n = pad_batch(data[sel], label[sel], cfg.test_batch_size)
        stack_x.append(bx)
        stack_y.append(by)
        counts.append(n)
        order.append(sel)
    if not stack_x:
        raise ValueError("run_infer: empty split")

    scan = seg_steps.seg_eval_scan if cfg.task == "pointsegda" else steps.eval_scan
    logits = steps.scan_in_chunks(scan, state, stack_x)
    logits = np.concatenate(
        [lg[:n] for lg, n in zip(logits, counts)], axis=0)
    order = np.concatenate(order)

    logp = metrics.log_softmax_np(logits)
    pred = logits.argmax(-1).astype(np.int64)
    true = np.concatenate([by[:n] for by, n in zip(stack_y, counts)], axis=0)

    out_path = cfg.output or os.path.join(io.path, "predictions.npz")
    np.savez_compressed(out_path, pred=pred, prob=np.exp(logp),
                        label=true, index=order)
    summary = {
        "output": out_path, "dataset": cfg.dataset, "split": cfg.split,
        "n": int(pred.shape[0]),
        "acc": round(float(np.mean(pred == true)), 6),
    }
    io.cprint(json.dumps(summary))
    return summary


def run_aot_export(cfg: EvalConfig, io: IOStream | None = None) -> dict:
    """Freeze a checkpoint into an AOT serving bundle (`mlsp-tpu aot`).

    Writes `cfg.output` (a directory) with the jax.export StableHLO
    eval program + weights + metadata (`mlsp_tpu.serving`), then
    self-checks: reloads the bundle and compares its predictions against
    the live model on a random batch. The bundle's kNN path is forced to
    the XLA backend so one artifact serves on both cpu and tpu.
    """
    from mlsp_tpu import serving
    from mlsp_tpu.train.state import create_train_state

    cfg = cfg.resolved()
    io = io or IOStream(cfg.out_path, cfg.exp_name)

    key = jax.random.key(cfg.seed)
    sample = jnp.zeros((1, cfg.num_points, 3), jnp.float32)
    # "xla" kNN everywhere: one artifact must lower for cpu AND tpu
    # (Pallas kernels are chip-toolchain-specific)
    model, heads = _build_model(cfg, knn_backend="xla")
    state = create_train_state(model, key, sample, heads=heads)
    state = _load_weights(cfg, state, io)

    out_dir = cfg.output or os.path.join(io.path, "serving_bundle")
    meta = serving.save_serving_bundle(
        state, model, out_dir, task=cfg.task,
        num_points=cfg.num_points, num_class=cfg.num_class)
    # batch-polymorphic by default: one artifact, any serving batch

    # self-check: the frozen program must reproduce the live model
    bundle = serving.load_serving_bundle(out_dir)
    rng = np.random.default_rng(0)
    x = (rng.standard_normal(
        (cfg.test_batch_size, cfg.num_points, 3)) * 0.5).astype(np.float32)
    frozen = bundle.predict(x)
    # jitted: an eager forward costs 1 RTT per op through the TPU relay
    live = np.asarray(jax.jit(serving._build_eval_fn(model, cfg.task))(
        state.params, state.batch_stats, jnp.asarray(x)))
    max_diff = float(np.abs(frozen - live).max())
    summary = {"output": out_dir, "model": cfg.model, "task": cfg.task,
               **meta, "selfcheck_max_diff": max_diff}
    # The frozen and live programs are compiled independently; their f32
    # distance bits can flip a near-tie kNN edge (measured ~1e-3 logit
    # diffs on TPU). A broken bundle is orders of magnitude off.
    if max_diff > 2e-2:
        raise RuntimeError(
            f"AOT bundle self-check failed: max diff {max_diff}")
    io.cprint(json.dumps(summary))
    return summary


def run_export(cfg: EvalConfig, io: IOStream | None = None) -> dict:
    """Export a checkpoint as a reference-loadable torch `model.pt`.

    The inverse of `--from_torch`: a model trained (or fine-tuned) here
    drops back into the reference's own stack — its trainers load the
    file via `model.load_state_dict` (`train_spst.py:136-145`) with
    strict key/shape checking. Accepts a native `.ckpt` (or, with
    `--from_torch 1`, a reference `model.pt`, making this a checkpoint
    normaliser). Supported: dgcnn, pointnet, dgcnn_seg,
    hengshuang(/-_seg) — all strict-loadable — and point_transformer
    (backbone + cls head; torch loads strict=False, the reference's own
    pretrained-transformer mode).
    """
    from mlsp_tpu.train.state import create_train_state
    from mlsp_tpu.utils import torch_export

    cfg = cfg.resolved()
    io = io or IOStream(cfg.out_path, cfg.exp_name)
    exporters = {
        "dgcnn": lambda v: torch_export.export_dgcnn(v, cfg.pergroup),
        "pointnet": torch_export.export_pointnet,
        "dgcnn_seg": lambda v: torch_export.export_dgcnn_seg(v, cfg.pergroup),
        # backbone + cls head only (the reference DefRec pyramid is CUDA
        # code our redesign replaced): torch must load strict=False, like
        # the reference's own load_model_from_ckpt (Models.py:458)
        "point_transformer": torch_export.export_point_transformer,
        "transformer": torch_export.export_point_transformer,
        "hengshuang": torch_export.export_hengshuang,
        "hengshuang_transformer": torch_export.export_hengshuang,
        "hengshuang_seg": torch_export.export_hengshuang,
    }
    if cfg.model not in exporters:
        raise ValueError(
            "export supports dgcnn/pointnet/dgcnn_seg/point_transformer/"
            f"hengshuang/hengshuang_seg, not {cfg.model!r}")
    seg_models = {"dgcnn_seg", "hengshuang_seg"}
    if (cfg.model in seg_models) != (cfg.task == "pointsegda"):
        raise ValueError(
            f"model {cfg.model!r} does not belong to task {cfg.task!r}: "
            "seg backbones require --task pointsegda; classification "
            "backbones require --task pointda")

    key = jax.random.key(cfg.seed)
    sample = jnp.zeros((1, cfg.num_points, 3), jnp.float32)
    # Shared constructor: the density head width/bins must match the
    # checkpoint for the importer's shape checks (and the analytic fc2
    # bins) to line up.
    model, heads = _build_model(cfg)
    state = create_train_state(model, key, sample, heads=heads)
    state = _load_weights(cfg, state, io)

    sd = exporters[cfg.model](
        {"params": state.params, "batch_stats": state.batch_stats})
    out_path = cfg.output or os.path.join(io.path, "model.pt")
    if os.path.dirname(out_path):
        os.makedirs(os.path.dirname(out_path), exist_ok=True)
    torch_export.save_torch_checkpoint(sd, out_path)
    summary = {"output": out_path, "model": cfg.model, "keys": len(sd)}
    io.cprint(json.dumps(summary))
    return summary
