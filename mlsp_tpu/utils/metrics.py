"""Evaluation metrics (numpy, torch/sklearn-free).

Semantics match the sklearn calls in the reference (`utils/log.py:48-59`,
`PointSegDA/trainer.py:224-233`): accuracy, balanced accuracy = mean of
per-class recall over classes present in y_true, confusion matrix, and
macro Jaccard (mIoU) over the union of labels present.
"""

from __future__ import annotations

import numpy as np


def log_softmax_np(logits: np.ndarray) -> np.ndarray:
    """Numerically-stable log-softmax over the last axis (shared by the
    eval/selection loops)."""
    m = logits.max(-1, keepdims=True)
    e = logits - m
    return e - np.log(np.exp(e).sum(-1, keepdims=True))


def softmax_np(logits: np.ndarray) -> np.ndarray:
    e = np.exp(logits - logits.max(-1, keepdims=True))
    return e / e.sum(-1, keepdims=True)


def accuracy(y_true, y_pred) -> float:
    y_true, y_pred = np.asarray(y_true), np.asarray(y_pred)
    return float((y_true == y_pred).mean()) if y_true.size else 0.0


def balanced_accuracy(y_true, y_pred) -> float:
    y_true, y_pred = np.asarray(y_true), np.asarray(y_pred)
    recalls = []
    for c in np.unique(y_true):
        m = y_true == c
        recalls.append((y_pred[m] == c).mean())
    return float(np.mean(recalls)) if recalls else 0.0


def confusion_matrix(y_true, y_pred, num_classes: int) -> np.ndarray:
    y_true, y_pred = np.asarray(y_true).astype(int), np.asarray(y_pred).astype(int)
    cm = np.zeros((num_classes, num_classes), dtype=np.int64)
    np.add.at(cm, (y_true, y_pred), 1)
    return cm


def jaccard_macro(y_true, y_pred) -> float:
    """Macro-averaged IoU over labels present in y_true or y_pred
    (sklearn `jaccard_score(average="macro")` default labels)."""
    y_true, y_pred = np.asarray(y_true), np.asarray(y_pred)
    labels = np.union1d(np.unique(y_true), np.unique(y_pred))
    ious = []
    for c in labels:
        inter = ((y_true == c) & (y_pred == c)).sum()
        union = ((y_true == c) | (y_pred == c)).sum()
        ious.append(inter / union if union else 0.0)
    return float(np.mean(ious)) if len(ious) else 0.0


def seg_metrics(labels, preds) -> tuple[float, float]:
    """Per-shape mIoU + accuracy sums over a batch
    (`PointSegDA/trainer.py:224-233` — caller divides by sample count)."""
    labels, preds = np.asarray(labels), np.asarray(preds)
    miou = acc = 0.0
    for b in range(labels.shape[0]):
        miou += jaccard_macro(labels[b], preds[b])
        acc += (labels[b] == preds[b]).mean()
    return miou, acc
