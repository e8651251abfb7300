"""MLSP loss functions (channels-last, mask = [B, N]).

Weight/normalisation semantics match the reference exactly; citations per
function. `p_vec` density predictions are post-softmax probabilities
(matching `Density_prediction.forward`, `PointDA/Models.py:272-285`).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from mlsp_tpu.ops.chamfer import reconstruction_loss

DEFREC_SCALER = 20.0  # MLSP/mlsp.py:7
_KL_EPS = 1e-10
_L1_LAMBDA = 0.05  # mlsp.py:431 lambda_1
_KL_LAMBDA = 1.0  # mlsp.py:432 lambda_2


def cross_entropy(logits: jax.Array, labels: jax.Array) -> jax.Array:
    """Mean softmax cross-entropy with integer labels (torch CE parity)."""
    logp = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(logp, labels[..., None], axis=-1)[..., 0]
    return jnp.mean(nll)


def defrec_loss(pred, gold, mask, defrec_weight: float) -> jax.Array:
    """`mlsp.calc_loss` (mlsp.py:222-229)."""
    return defrec_weight * reconstruction_loss(pred, gold, mask) * DEFREC_SCALER


def scan_rec_loss(pred, gold, mask, scan_rec_weight: float) -> jax.Array:
    """`mlsp.calc_scan_loss` (mlsp.py:231-238)."""
    return scan_rec_weight * reconstruction_loss(pred, gold, mask) * DEFREC_SCALER


def _unit(v):
    return v / jnp.linalg.norm(v, axis=-1, keepdims=True).clip(1e-12)


def normal_loss(pred, gt, weight: float) -> jax.Array:
    """`mlsp.calc_normal_loss` (mlsp.py:275-287): -mean |cos|."""
    cos = jnp.sum(_unit(pred) * _unit(gt), axis=-1)
    return -weight * jnp.mean(jnp.abs(cos))


def region_weights(mask: jax.Array, defpart: bool, boost: float = 26.0) -> jax.Array:
    """Per-point loss weights from the deform mask.

    The headline recipe weights deformed points 27x ((mask*26)+1,
    `PointDA/trainer.py:437-440`); `Density_normal_defpart` restricts to
    the deformed region only. PointSegDA uses boost=1 (`trainer.py:409-412`).
    """
    return mask if defpart else mask * boost + 1.0


def masked_normal_loss(pred, gt, weights, weight: float) -> jax.Array:
    """Trainer-inline normal loss (`PointDA/trainer.py:441-448`).

    -sum(|cos| * w) / sum(w), one global normalisation over the batch.
    """
    cos = jnp.abs(jnp.sum(_unit(pred) * _unit(gt), axis=-1))  # [B, N]
    return -weight * jnp.sum(cos * weights) / jnp.maximum(jnp.sum(weights), 1e-12)


def density_loss(
    p_vec: jax.Array,
    p_val: jax.Array,
    target_vec: jax.Array,
    target_val: jax.Array,
    density_weight: float,
    mask: jax.Array | None = None,
) -> tuple[jax.Array, jax.Array]:
    """`mlsp.densityloss` (mlsp.py:430-454).

    Args:
      p_vec: [M, C] predicted class probabilities (softmaxed).
      p_val: [M] predicted expected count.
      target_vec: [M, C] soft two-hot labels.
      target_val: [M] count regression target.
      mask: optional [M] per-point weights.

    Returns:
      (kl, mae) — cross-entropy-vs-soft-label term (x lambda_2) and L1
      term (x lambda_1), each scaled by density_weight.
    """
    ll = jnp.sum(target_vec * jnp.log(p_vec + _KL_EPS), axis=-1)  # [M]
    ae = jnp.abs(p_val - target_val)
    if mask is None:
        kl = -density_weight * jnp.mean(ll) * _KL_LAMBDA
        mae = density_weight * jnp.mean(ae) * _L1_LAMBDA
    else:
        denom = jnp.maximum(jnp.sum(mask), 1e-12)
        kl = -density_weight * jnp.sum(ll * mask) / denom * _KL_LAMBDA
        mae = density_weight * jnp.sum(ae * mask) / denom * _L1_LAMBDA
    return kl, mae


def mixup_cross_entropy(logits, y_a, y_b, lam, defrec_weight: float) -> jax.Array:
    """`PCM.calc_loss` (PCM.py:76-89)."""
    loss = lam * cross_entropy(logits, y_a) + (1.0 - lam) * cross_entropy(logits, y_b)
    return loss * (1.0 - defrec_weight)


def _gather_rows(x: jax.Array, idx: jax.Array) -> jax.Array:
    """Per-batch row gather: x [B, N, ...], idx [B, N] -> [B, N, ...]."""
    if x.ndim == 2:
        return jnp.take_along_axis(x, idx, axis=1)
    return jnp.take_along_axis(x, idx[..., None], axis=1)


def transported_normal_loss(
    normal_pred, normal_labels, weights, idx_pair, weight: float
) -> jax.Array:
    """`mlsp.calc_def_normal_loss` (mlsp.py:289-329).

    Transports labels onto predictions (and vice versa) through the
    Chamfer nearest-index maps, weights by `weights` (see
    `region_weights`), normalises per cloud, sums, divides by batch —
    both directions.
    """
    i1, i2 = idx_pair
    B = normal_pred.shape[0]
    np_, nl = _unit(normal_pred), _unit(normal_labels)

    denom = jnp.maximum(jnp.sum(weights, axis=1), 1e-12)  # defpart masks can be empty
    gt_on_pred = _gather_rows(nl, i1)
    t = jnp.abs(jnp.sum(np_ * gt_on_pred, axis=-1))
    loss = -jnp.sum(jnp.sum(t * weights, axis=1) / denom) / B

    pred_on_gt = _gather_rows(np_, i2)
    t2 = jnp.abs(jnp.sum(pred_on_gt * nl, axis=-1))
    loss = loss - jnp.sum(jnp.sum(t2 * weights, axis=1) / denom) / B
    return weight * loss


def transported_density_loss(
    p_vec, p_val, target_vec, target_val, weights, idx_pair, density_weight: float
) -> tuple[jax.Array, jax.Array]:
    """`mlsp.deform_densityloss` (mlsp.py:370-427).

    Args are batched: p_vec [B, N, C], p_val [B, N], target_vec [B, N, C],
    target_val [B, N], weights [B, N]. Direction 1 scores predictions
    against index1-transported labels; direction 2 (as in the reference)
    swaps roles — transported predictions become the "target" against the
    original labels' log-probabilities.
    """
    i1, i2 = idx_pair
    B, N, C = p_vec.shape
    w = weights.reshape(-1)

    gt_vec = _gather_rows(target_vec, i1).reshape(-1, C)
    gt_val = _gather_rows(target_val, i1).reshape(-1)
    kl, mae = density_loss(
        p_vec.reshape(-1, C), p_val.reshape(-1), gt_vec, gt_val, density_weight, mask=w
    )

    pred_vec = _gather_rows(p_vec, i2).reshape(-1, C)
    pred_val = _gather_rows(p_val, i2).reshape(-1)
    kl1, mae1 = density_loss(
        target_vec.reshape(-1, C),
        target_val.reshape(-1),
        pred_vec,
        pred_val,
        density_weight,
        mask=w,
    )
    return kl + kl1, mae + mae1
