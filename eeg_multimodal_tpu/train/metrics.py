"""Loss and metrics matching the reference's numbers.

- :func:`cal_loss` mirrors TrainAndTest.cal_loss (base_train.py:59-65):
  mean cross-entropy + batch accuracy, extended with a sample-weight vector so
  padded (static-shape) final batches reproduce DataLoader's drop_last=False
  batch means exactly.
- :func:`f1_binary` matches sklearn.metrics.f1_score's binary default
  (base_train.py:233) — note the reference passes predictions as the first
  argument (y_true slot); binary F1 is symmetric under that swap so the
  numbers agree either way.
- :func:`METRICS` is the dynamic metric registry mirroring the legacy
  trainer's ``torchmetrics.__dict__[name]`` lookup (train.py:79-80).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def cross_entropy(logits, labels):
    """Per-sample CE, torch F.cross_entropy semantics (mean reduction done
    by the caller with weights)."""
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    return -jnp.take_along_axis(logp, labels[:, None], axis=-1)[:, 0]


def cal_loss(logits, labels, weight=None):
    """(loss, accuracy, pred_label_id, label) as base_train.py:59-65,
    weight-aware for padded batches."""
    ce = cross_entropy(logits, labels)
    pred = jnp.argmax(logits, axis=-1)
    correct = (pred == labels).astype(jnp.float32)
    if weight is None:
        weight = jnp.ones_like(ce)
    denom = jnp.maximum(weight.sum(), 1.0)
    loss = (ce * weight).sum() / denom
    acc = (correct * weight).sum() / denom
    return loss, acc, pred, labels


def f1_binary(y_true, y_pred) -> float:
    """sklearn f1_score(y_true, y_pred) with binary average, pos_label=1."""
    y_true = np.asarray(y_true)
    y_pred = np.asarray(y_pred)
    tp = float(np.sum((y_true == 1) & (y_pred == 1)))
    fp = float(np.sum((y_true == 0) & (y_pred == 1)))
    fn = float(np.sum((y_true == 1) & (y_pred == 0)))
    denom = 2 * tp + fp + fn
    return 2 * tp / denom if denom > 0 else 0.0


def f1_binary_jnp(y_true, y_pred, weight=None):
    """In-jit version of :func:`f1_binary` (used by the vmapped sweep)."""
    if weight is None:
        weight = jnp.ones_like(y_true, jnp.float32)
    t1 = (y_true == 1) & (weight > 0)
    p1 = y_pred == 1
    tp = jnp.sum((t1 & p1).astype(jnp.float32))
    fp = jnp.sum(((~t1) & p1 & (weight > 0)).astype(jnp.float32))
    fn = jnp.sum((t1 & (~p1)).astype(jnp.float32))
    denom = 2 * tp + fp + fn
    return jnp.where(denom > 0, 2 * tp / denom, 0.0)


def accuracy(y_true, y_pred) -> float:
    y_true, y_pred = np.asarray(y_true), np.asarray(y_pred)
    return float((y_true == y_pred).mean()) if len(y_true) else 0.0


def auroc(y_true, scores) -> float:
    """Binary AUROC by rank statistic (torchmetrics 'AUROC' equivalent)."""
    y_true = np.asarray(y_true)
    scores = np.asarray(scores, np.float64)
    pos = scores[y_true == 1]
    neg = scores[y_true == 0]
    if len(pos) == 0 or len(neg) == 0:
        return 0.0
    order = np.argsort(np.concatenate([neg, pos]), kind="mergesort")
    ranks = np.empty_like(order, dtype=np.float64)
    ranks[order] = np.arange(1, len(order) + 1)
    # average ties
    allv = np.concatenate([neg, pos])
    sorted_v = allv[order]
    i = 0
    while i < len(sorted_v):
        j = i
        while j + 1 < len(sorted_v) and sorted_v[j + 1] == sorted_v[i]:
            j += 1
        if j > i:
            avg = (i + j) / 2.0 + 1.0
            ranks[order[i : j + 1]] = avg
        i = j + 1
    r_pos = ranks[len(neg) :].sum()
    n_pos, n_neg = len(pos), len(neg)
    return float((r_pos - n_pos * (n_pos + 1) / 2) / (n_pos * n_neg))


# dynamic registry mirroring `torchmetrics.__dict__[name]` (train.py:79-80)
METRICS = {
    "Accuracy": lambda labels, preds, scores=None: accuracy(labels, preds),
    "F1Score": lambda labels, preds, scores=None: f1_binary(labels, preds),
    "AUROC": lambda labels, preds, scores=None: auroc(
        labels, scores if scores is not None else preds
    ),
}
