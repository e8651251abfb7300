"""Jitted PointSegDA train/eval steps.

One fused iteration of `PointSegDA/trainer.py:292-437`: source
segmentation CE (optionally on PCM-seg-mixed clouds) + target SSL
branches (DefRec / normals / density / combined). Differences from the
PointDA step, per the reference: per-point CE over 8 part classes,
deform-mask weight boost is +1 (not *26+1, `trainer.py:409-412`),
density labels use `shift` (=10) and pergroup 5.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from mlsp_tpu import losses as L
from mlsp_tpu import ops
from mlsp_tpu import transforms as T
from mlsp_tpu.train.steps import (_apply, augment_batch, deform_dispatch,
                                  pcm_mix_segmentation)


def seg_cross_entropy(logits, labels):
    """Mean per-point CE: logits [B, N, C], labels [B, N]."""
    logp = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(logp, labels[..., None], axis=-1)[..., 0]
    return jnp.mean(nll)


def _seg_step_inner(state, src_x, src_y, trgt_x, key, cfg):
    keys = jax.random.split(key, 12)
    src_x = augment_batch(keys[0], src_x)
    trgt_x = augment_batch(keys[1], trgt_x)
    debug_aux = getattr(cfg, "debug_aux", False)

    def loss_fn(params):
        bstats = state.batch_stats
        total = jnp.float32(0.0)
        m = {}

        # ---- source segmentation ----
        sx, sy = src_x, src_y
        if cfg.apply_PCM:
            sx, sy = pcm_mix_segmentation(keys[2], sx, sy, cfg.mixup_params)
        if debug_aux:
            m.update(aux_src=sx, aux_sy=sy, aux_trgt=trgt_x)
        logits, bstats = _apply(state, params, bstats, sx, ("seg",), keys[3])
        l = (1.0 - cfg.DefRec_weight) * seg_cross_entropy(logits["seg"], sy)
        m["src_seg"] = l
        total = total + l
        seg_preds = jnp.argmax(logits["seg"], axis=-1)

        # ---- target SSL ----
        if cfg.DefRec_on_trgt:
            dx, mask = deform_dispatch(keys[4], trgt_x, cfg)
            if debug_aux:
                m.update(aux_dx=dx, aux_dmask=mask)
            logits, bstats = _apply(state, params, bstats, dx, ("defrec",), keys[5])
            l = L.defrec_loss(logits["defrec"], trgt_x, mask, cfg.DefRec_weight)
            m["trgt_DefRec"] = l
            total = total + l

        if cfg.Norm_on_trgt:
            n_gt = ops.estimate_normals(trgt_x, cfg.near)
            logits, bstats = _apply(state, params, bstats, trgt_x, ("normal",), keys[6])
            l = L.normal_loss(logits["normal"], n_gt, cfg.normal_pred_weight)
            m["trgt_Normal"] = l
            total = total + l

        if cfg.Density_on_trgt:
            dvec, dval = ops.density_labels(
                trgt_x, cfg.density_radius, cfg.density_num_class,
                cfg.pergroup, cfg.shift,
            )
            logits, bstats = _apply(state, params, bstats, trgt_x, ("density",), keys[7])
            C = cfg.density_num_class
            kl, mae = L.density_loss(
                logits["density"].reshape(-1, C),
                logits["density_mse"].reshape(-1),
                dvec.reshape(-1, C),
                dval.reshape(-1),
                cfg.Density_weight,
            )
            m["trgt_Density_cls"] = kl
            m["trgt_Density_mse"] = mae
            total = total + kl + mae

        if cfg.Density_normal_viainput:
            n_gt = ops.estimate_normals(trgt_x, cfg.near)
            dvec, dval = ops.density_labels(
                trgt_x, cfg.density_radius, cfg.density_num_class,
                cfg.pergroup, cfg.shift,
            )
            dx, mask = deform_dispatch(keys[8], trgt_x, cfg)
            logits, bstats = _apply(
                state, params, bstats, dx, ("defrec", "normal", "density"), keys[9]
            )
            l = L.defrec_loss(logits["defrec"], trgt_x, mask, cfg.DefRec_weight)
            m["trgt_DefRec"] = m.get("trgt_DefRec", 0.0) + l
            total = total + l
            # Seg variant: boost +1, not *26+1 (PointSegDA/trainer.py:412).
            w = L.region_weights(mask, cfg.Density_normal_defpart, boost=1.0)
            if cfg.Normal_ondef:
                nl = L.masked_normal_loss(
                    logits["normal"], n_gt, w, cfg.normal_pred_weight
                )
                m["trgt_def_normal"] = nl
                total = total + nl
            if cfg.Density_ondef:
                C = cfg.density_num_class
                kl, mae = L.density_loss(
                    logits["density"].reshape(-1, C),
                    logits["density_mse"].reshape(-1),
                    dvec.reshape(-1, C),
                    dval.reshape(-1),
                    cfg.Density_weight,
                    mask=w.reshape(-1),
                )
                m["trgt_def_density_cls"] = kl
                m["trgt_def_density_mse"] = mae
                total = total + kl + mae

        m["total"] = total
        return total, (m, bstats, (seg_preds, sy))

    grads, (m, bstats, train_preds) = jax.grad(loss_fn, has_aux=True)(state.params)
    state = state.apply_gradients(grads=grads).replace(batch_stats=bstats)
    return state, m, train_preds


@partial(jax.jit, static_argnames=("cfg",))
def pointsegda_train_step(state, src_x, src_y, trgt_x, key, cfg):
    return _seg_step_inner(state, src_x, src_y, trgt_x, key, cfg)


@partial(jax.jit, static_argnames=("cfg",))
def pointsegda_train_scan(state, src_xs, src_ys, trgt_xs, key, cfg):
    """S seg train steps as one device program (cf. pointda_train_scan)."""

    def body(carry, batch):
        state, key = carry
        key, k = jax.random.split(key)
        sx, sy, tx = batch
        state, m, preds = _seg_step_inner(state, sx, sy, tx, k, cfg)
        return (state, key), (m, preds)

    (state, _), (ms, preds) = jax.lax.scan(
        body, (state, key), (src_xs, src_ys, trgt_xs)
    )
    return state, ms, preds


@partial(jax.jit, static_argnames=("apply_fn",))
def _seg_eval_forward(apply_fn, params, bstats, x):
    out = apply_fn(
        {"params": params, "batch_stats": bstats}, x, train=False, heads=("seg",)
    )
    return out["seg"]


def seg_eval_step(state, x):
    return _seg_eval_forward(state.apply_fn, state.params, state.batch_stats, x)


@partial(jax.jit, static_argnames=("apply_fn",))
def _seg_eval_forward_scan(apply_fn, params, bstats, xs):
    def body(_, x):
        out = apply_fn(
            {"params": params, "batch_stats": bstats}, x, train=False,
            heads=("seg",),
        )
        return (), out["seg"]

    _, logits = jax.lax.scan(body, (), xs)
    return logits


def seg_eval_scan(state, xs):
    """Scanned seg eval: xs [S, B, N, 3] -> logits [S, B, N, C] in ONE
    device program (cf. `steps.eval_scan`)."""
    return _seg_eval_forward_scan(state.apply_fn, state.params,
                                  state.batch_stats, xs)
