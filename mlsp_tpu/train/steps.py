"""Jitted train/eval steps — the whole MLSP recipe fused on device.

One `pointda_train_step` reproduces an entire reference train iteration
(`PointDA/trainer.py:374-571`): per-epoch augmentation, PCM mixup (FPS
on device), DefRec deformation, normal + cardinality ground-truth
generation (the PCL replacement), every SSL head forward, and a single
optimizer update (the reference accumulates `.backward()`s and steps
once — summing the losses is the same program).

The config dataclass is a static argument, so every flag combination
compiles to a lean graph containing only its active branches.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from mlsp_tpu import losses as L
from mlsp_tpu import ops
from mlsp_tpu import transforms as T


def _apply(state, params, bstats, x, heads, key, train=True):
    """One train-mode forward; threads batch_stats like torch's
    sequential BN updates across the reference's multiple forwards.
    `train=False` (cfg.debug_bn_eval) freezes BN to the running stats —
    eval-mode forwards, no stat updates — for the chaos-free trajectory
    differentials."""
    if not train:
        out = state.apply_fn(
            {"params": params, "batch_stats": bstats},
            x, train=False, heads=heads, rngs={"dropout": key},
        )
        return out, bstats
    out, mut = state.apply_fn(
        {"params": params, "batch_stats": bstats},
        x,
        train=True,
        heads=heads,
        rngs={"dropout": key},
        mutable=["batch_stats"],
    )
    return out, mut["batch_stats"]


def augment_batch(key, x):
    """In-step equivalent of the loader-side train augmentation
    (`dataloader.py:92-93`): random z-rotation + clipped jitter."""
    kr, kj = jax.random.split(key)
    return T.jitter(kj, T.random_rotate_one_axis(kr, x, "z"))


def deform_dispatch(key, x, cfg):
    """`DefRec_dist` dispatch (`MLSP/mlsp.py:33-46`): every reference
    deform call routes through `deform_input`, which collapses a radius
    neighbourhood (`pc_utils.collapse_to_point`) when the flag is
    'volume_based_radius' and a populated voxel otherwise. cfg is a
    static jit argument, so each value compiles only its own branch."""
    if cfg.DefRec_dist == "volume_based_radius":
        return T.collapse_to_point_batch(key, x)
    return T.deform_batch(key, x, cfg.num_regions)


def pcm_mix(key, x, y, mixup_params: float):
    """PCM mixup on device (`MLSP/PCM.py:6-38`).

    Draws lam ~ Beta(a, a), FPS-samples round(lam*N) points from each
    cloud and N - round(lam*N) from a batch-permuted partner, concats and
    point-permutes. Uses the FPS prefix property to keep shapes static
    under the data-dependent split.
    """
    B, N, _ = x.shape
    kperm, klam, ksa, ksb, kpts = jax.random.split(key, 5)
    perm = jax.random.permutation(kperm, B)
    if mixup_params > 0:
        lam = jax.random.beta(klam, mixup_params, mixup_params)
    else:
        lam = jnp.float32(1.0)
    num_a = jnp.round(lam * N).astype(jnp.int32)

    xb = x[perm]
    order_a = ops.fps(x, N, jax.random.randint(ksa, (B,), 0, N))
    order_b = ops.fps(xb, N, jax.random.randint(ksb, (B,), 0, N))
    va = ops.fps_gather(x, order_a)  # FPS-ordered: prefix m == FPS(m)
    vb = ops.fps_gather(xb, order_b)

    i = jnp.arange(N)
    idx_b = jnp.clip(i - num_a, 0, N - 1)
    mixed = jnp.where((i < num_a)[None, :, None], va, vb[:, idx_b])
    mixed = mixed[:, jax.random.permutation(kpts, N)]
    return mixed, (y, y[perm], lam)


def pcm_mix_segmentation(key, x, y, mixup_params: float):
    """Segmentation PCM (`PCM.py:40-73`): also transports point labels."""
    B, N, _ = x.shape
    kperm, klam, ksa, ksb, kpts = jax.random.split(key, 5)
    perm = jax.random.permutation(kperm, B)
    if mixup_params > 0:
        lam = jax.random.beta(klam, mixup_params, mixup_params)
    else:
        lam = jnp.float32(1.0)
    num_a = jnp.round(lam * N).astype(jnp.int32)

    xb, yb = x[perm], y[perm]
    order_a = ops.fps(x, N, jax.random.randint(ksa, (B,), 0, N))
    order_b = ops.fps(xb, N, jax.random.randint(ksb, (B,), 0, N))
    va, la = ops.fps_gather(x, order_a), jnp.take_along_axis(y, order_a, 1)
    vb, lb = ops.fps_gather(xb, order_b), jnp.take_along_axis(yb, order_b, 1)

    i = jnp.arange(N)
    idx_b = jnp.clip(i - num_a, 0, N - 1)
    take_a = i < num_a
    mixed = jnp.where(take_a[None, :, None], va, vb[:, idx_b])
    mixed_y = jnp.where(take_a[None, :], la, lb[:, idx_b])
    pp = jax.random.permutation(kpts, N)
    return mixed[:, pp], mixed_y[:, pp]


def _ssl_recipe_losses(cfg, logits, x_orig, mask, normal_gt, dvec, dval, prefix, m):
    """Shared DefRec+Normal+Density-on-deformed block
    (`PointDA/trainer.py:434-455` source / `:544-565` target)."""
    total = L.defrec_loss(logits["defrec"], x_orig, mask, cfg.DefRec_weight)
    # Accumulate: DefRec_on_trgt + Density_normal_viainput both emit a
    # target DefRec term (the reference sums them into one counter,
    # trainer.py:471,545).
    m[f"{prefix}_DefRec"] = m.get(f"{prefix}_DefRec", 0.0) + total
    w = L.region_weights(mask, cfg.Density_normal_defpart)
    if cfg.Normal_ondef:
        nl = L.masked_normal_loss(logits["normal"], normal_gt, w, cfg.normal_pred_weight)
        m[f"{prefix}_def_normal"] = nl
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
        m[f"{prefix}_def_density_cls"] = kl
        m[f"{prefix}_def_density_mse"] = mae
        total = total + kl + mae
    return total


def _pointda_grads_inner(state, src_x, src_y, trgt_x, key, cfg):
    """Loss + grads of the full MLSP PointDA iteration (untraced body)."""
    keys = jax.random.split(key, 17)
    src_x = augment_batch(keys[0], src_x)
    trgt_x = augment_batch(keys[1], trgt_x)
    debug_aux = getattr(cfg, "debug_aux", False)
    trn = not getattr(cfg, "debug_bn_eval", False)
    aux = {"aux_src": src_x, "aux_trgt": trgt_x} if debug_aux else {}

    def loss_fn(params):
        bstats = state.batch_stats
        total = jnp.float32(0.0)
        m = {}

        # ---- source supervised ----
        if cfg.DefRec_on_src:
            dx, mask = deform_dispatch(keys[2], src_x, cfg)
            logits, bstats = _apply(state, params, bstats, dx, ("defrec",), keys[3], train=trn)
            l = L.defrec_loss(logits["defrec"], src_x, mask, cfg.DefRec_weight)
            m["src_DefRec"] = l
            total = total + l

        if cfg.apply_PCM:
            mixed, (ya, yb, lam) = pcm_mix(keys[4], src_x, src_y, cfg.mixup_params)
            if debug_aux:
                m.update(aux_mixed=mixed, aux_ya=ya, aux_yb=yb, aux_lam=lam)
            logits, bstats = _apply(state, params, bstats, mixed, (), keys[5], train=trn)
            l = L.mixup_cross_entropy(logits["cls"], ya, yb, lam, cfg.DefRec_weight)
            m["src_mixup"] = l
            total = total + l
        else:
            logits, bstats = _apply(state, params, bstats, src_x, (), keys[5], train=trn)
            l = (1.0 - cfg.DefRec_weight) * L.cross_entropy(logits["cls"], src_y)
            m["src_cls"] = l
            total = total + l

        if cfg.Density_normal_viainput_onsrc:
            n_gt = ops.estimate_normals(src_x, cfg.near)
            dvec, dval = ops.density_labels(
                src_x, cfg.radius, cfg.density_num_class, cfg.pergroup
            )
            dx, mask = deform_dispatch(keys[6], src_x, cfg)
            logits, bstats = _apply(
                state, params, bstats, dx, ("defrec", "normal", "density"),
                keys[7], train=trn,
            )
            total = total + _ssl_recipe_losses(
                cfg, logits, src_x, mask, n_gt, dvec, dval, "src", m
            )

        # ---- target self-supervised ----
        if cfg.DefRec_on_trgt:
            dx, mask = deform_dispatch(keys[8], trgt_x, cfg)
            logits, bstats = _apply(state, params, bstats, dx, ("defrec",), keys[9], train=trn)
            l = L.defrec_loss(logits["defrec"], trgt_x, mask, cfg.DefRec_weight)
            m["trgt_DefRec"] = l
            total = total + l

        if cfg.Norm_on_trgt:
            n_gt = ops.estimate_normals(trgt_x, cfg.near)
            logits, bstats = _apply(state, params, bstats, trgt_x, ("normal",), keys[10], train=trn)
            l = L.normal_loss(logits["normal"], n_gt, cfg.normal_pred_weight)
            m["trgt_Normal"] = l
            total = total + l

        if cfg.Scan_on_trgt:
            sx, smask = T.scan_batch(keys[11], trgt_x)
            if debug_aux:
                m.update(aux_sx=sx, aux_smask=smask)
            logits, bstats = _apply(state, params, bstats, sx, ("scan",), keys[12], train=trn)
            l = L.scan_rec_loss(logits["scan"], trgt_x, smask, cfg.Scan_Rec_weight)
            m["trgt_Rec_scan"] = l
            total = total + l

        if cfg.Density_on_trgt:
            dvec, dval = ops.density_labels(
                trgt_x, cfg.radius, cfg.density_num_class, cfg.pergroup
            )
            logits, bstats = _apply(state, params, bstats, trgt_x, ("density",), keys[13], train=trn)
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
                trgt_x, cfg.radius, cfg.density_num_class, cfg.pergroup
            )
            dx, mask = deform_dispatch(keys[14], trgt_x, cfg)
            if debug_aux:
                # through the has_aux output (a closure write would leak
                # tracers out of the grad trace)
                m.update(aux_dx=dx, aux_dmask=mask, aux_ngt=n_gt,
                         aux_dvec=dvec, aux_dval=dval)
            logits, bstats = _apply(
                state, params, bstats, dx, ("defrec", "normal", "density"),
                keys[15], train=trn,
            )
            total = total + _ssl_recipe_losses(
                cfg, logits, trgt_x, mask, n_gt, dvec, dval, "trgt", m
            )

        elif cfg.Density_normal_viachamfer:
            # Chamfer-transported variant: labels move through the
            # nearest-index maps between the DefRec prediction and the
            # original cloud (`mlsp.findindexs` + `calc_def_*`).
            n_gt = ops.estimate_normals(trgt_x, cfg.near)
            dvec, dval = ops.density_labels(
                trgt_x, cfg.radius, cfg.density_num_class, cfg.pergroup
            )
            dx, mask = deform_dispatch(keys[14], trgt_x, cfg)
            logits, bstats = _apply(
                state, params, bstats, dx, ("defrec", "normal", "density"),
                keys[15], train=trn,
            )
            l = L.defrec_loss(logits["defrec"], trgt_x, mask, cfg.DefRec_weight)
            m["trgt_DefRec"] = m.get("trgt_DefRec", 0.0) + l
            total = total + l
            idx_pair = ops.nearest_index_pair(logits["defrec"], trgt_x, mask)
            w = L.region_weights(mask, cfg.Density_normal_defpart)
            if cfg.Normal_ondef:
                nl = L.transported_normal_loss(
                    logits["normal"], n_gt, w, idx_pair, cfg.normal_pred_weight
                )
                m["trgt_def_normal"] = nl
                total = total + nl
            if cfg.Density_ondef:
                kl, mae = L.transported_density_loss(
                    logits["density"], logits["density_mse"], dvec, dval,
                    w, idx_pair, cfg.Density_weight,
                )
                m["trgt_def_density_cls"] = kl
                m["trgt_def_density_mse"] = mae
                total = total + kl + mae

        if cfg.apply_SPL or cfg.apply_SPL_v2:
            # Inline self-paced pseudo-labels (the reference defines the
            # generators at `PointDA/trainer.py:265-293` — confidence- or
            # entropy-gated one-hots from the model's own predictions;
            # SPST is the full offline variant). Confidence computed
            # without gradient; CE applied to confident samples only.
            logits, bstats = _apply(state, params, bstats, trgt_x, (), keys[16], train=trn)
            cls = logits["cls"]
            conf = jax.lax.stop_gradient(jax.nn.softmax(cls, axis=-1))
            pseudo = jnp.argmax(conf, axis=-1)
            if cfg.apply_SPL_v2:
                # entropy of softmax(conf) — the reference's double
                # softmax quirk (trainer.py:285).
                ent = -jnp.sum(conf * jax.nn.log_softmax(conf, -1), axis=-1)
                keep = (ent < cfg.gamma_v2).astype(jnp.float32)
            else:
                keep = (jnp.max(conf, axis=-1) > cfg.gamma).astype(jnp.float32)
            logp = jax.nn.log_softmax(cls, axis=-1)
            nll = -jnp.take_along_axis(logp, pseudo[..., None], -1)[..., 0]
            l = jnp.sum(nll * keep) / jnp.maximum(jnp.sum(keep), 1.0)
            m["trgt_SPL"] = l
            m["trgt_SPL_selected"] = jnp.mean(keep)
            total = total + l

        m["total"] = total
        return total, (m, bstats)

    grads, (m, bstats) = jax.grad(loss_fn, has_aux=True)(state.params)
    if debug_aux:
        m = {**m, **aux, "aux_grads": grads}
    return grads, m, bstats


def _pointda_step_inner(state, src_x, src_y, trgt_x, key, cfg):
    """Full MLSP PointDA train iteration (untraced body)."""
    grads, m, bstats = _pointda_grads_inner(state, src_x, src_y, trgt_x, key, cfg)
    state = state.apply_gradients(grads=grads)
    state = state.replace(batch_stats=bstats)
    return state, m


@partial(jax.jit, static_argnames=("cfg",))
def pointda_train_step(state, src_x, src_y, trgt_x, key, cfg):
    """Single jitted MLSP train iteration. Returns (state, metrics)."""
    return _pointda_step_inner(state, src_x, src_y, trgt_x, key, cfg)


@partial(jax.jit, static_argnames=("cfg",))
def pointda_grads(state, src_x, src_y, trgt_x, key, cfg):
    """Loss + raw grads of the full iteration, no optimizer update.

    Used by the multi-chip dryrun to assert sharded-vs-single-device
    gradient equality (post-Adam params are ill-conditioned for this:
    a sign flip on a near-zero grad entry moves a param by 2*lr)."""
    grads, m, _ = _pointda_grads_inner(state, src_x, src_y, trgt_x, key, cfg)
    return grads, m


@partial(jax.jit, static_argnames=("cfg",))
def pointda_train_scan(state, src_xs, src_ys, trgt_xs, key, cfg):
    """Many MLSP train iterations in ONE device program via `lax.scan`.

    Host dispatch costs a fixed ~ms per call through a remote-TPU
    tunnel, which floors per-step wall time no matter how light the
    step is; scanning S steps per call amortises it away. This is also
    the production shape on TPU pods: stage an epoch of batches to HBM
    once, run the epoch as one program.

    Args:
      src_xs: [S, B, N, 3]; src_ys: [S, B]; trgt_xs: [S, B, N, 3].
      key: base PRNG key (folded per step).

    Returns:
      (state, metrics) — metrics stacked over S.
    """

    def body(carry, batch):
        state, key = carry
        key, k = jax.random.split(key)
        sx, sy, tx = batch
        state, m = _pointda_step_inner(state, sx, sy, tx, k, cfg)
        return (state, key), m

    (state, _), ms = jax.lax.scan(body, (state, key), (src_xs, src_ys, trgt_xs))
    return state, ms


@partial(jax.jit, static_argnames=("state_apply_fn",))
def _eval_forward(state_apply_fn, params, bstats, x):
    logits = state_apply_fn({"params": params, "batch_stats": bstats}, x, train=False)
    return logits["cls"]


def eval_step(state, x):
    """Eval forward (BN running stats, no dropout) -> class logits."""
    return _eval_forward(state.apply_fn, state.params, state.batch_stats, x)


@partial(jax.jit, static_argnames=("apply_fn",))
def _eval_forward_scan(apply_fn, params, bstats, xs):
    def body(_, x):
        out = apply_fn({"params": params, "batch_stats": bstats}, x, train=False)
        return (), out["cls"]

    _, logits = jax.lax.scan(body, (), xs)
    return logits


def eval_scan(state, xs):
    """Scanned eval: xs [S, B, N, 3] -> logits [S, B, C] in ONE device
    program (amortises per-dispatch overhead like the train scan)."""
    return _eval_forward_scan(state.apply_fn, state.params, state.batch_stats, xs)


# Batches per eval/selection device dispatch. Bounds the staged input to
# chunk*B*N*3 floats on host AND in HBM, so a real-dataset-sized split
# cannot OOM either (the reference streams batch-by-batch,
# `PointDA/trainer.py:298-331`; we stream chunk-by-chunk to keep the
# per-dispatch amortisation). At most two program shapes compile per
# split size (the full chunk and the remainder).
EVAL_SCAN_CHUNK = 64


def scan_in_chunks(scan_fn, state, batch_list, chunk=None):
    """Run `scan_fn(state, [s, ...])` over a list of equal-shape batches
    in bounded chunks; returns the stacked [S, ...] outputs as numpy
    (all-gathered across processes under multi-host — see
    `parallel.fetch_global`)."""
    import numpy as np

    from mlsp_tpu.parallel import fetch_global

    chunk = chunk or EVAL_SCAN_CHUNK
    outs = []
    for s in range(0, len(batch_list), chunk):
        xs = jnp.asarray(np.stack(batch_list[s : s + chunk]))
        outs.append(fetch_global(scan_fn(state, xs)))
    return np.concatenate(outs, axis=0)
