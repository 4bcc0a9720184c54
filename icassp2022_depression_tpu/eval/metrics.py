"""Evaluation metrics with the reference's exact conventions.

The reference reorders sklearn's confusion matrix into
``[[TP, FP], [FN, TN]]`` with *depressed = positive class* and computes
precision/recall/F1 from that matrix by hand
(``Classification/audio_gru_whole.py:128-159,222-230``).  Regression uses
sklearn MAE / RMSE (``Regression/audio_bilstm_perm.py:167,197-198``).

Two implementations are provided:

* host (NumPy) versions for reporting and for parity tests;
* device (jnp) versions used *inside* the jitted training program, so that
  the metric-gated best-checkpoint selection runs entirely on TPU.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


# ---------------------------------------------------------------------------
# Host (NumPy)
# ---------------------------------------------------------------------------


def standard_confusion_matrix(y_true, y_pred) -> np.ndarray:
    """Confusion matrix in the reference's ``[[TP, FP], [FN, TN]]`` layout.

    Mirrors ``standard_confusion_matrix`` (``audio_gru_whole.py:128-146``),
    which destructures sklearn's ``[[tn, fp], [fn, tp]]`` and reorders it.
    """
    y_true = np.asarray(y_true).astype(np.int64).ravel()
    y_pred = np.asarray(y_pred).astype(np.int64).ravel()
    tp = int(np.sum((y_true == 1) & (y_pred == 1)))
    tn = int(np.sum((y_true == 0) & (y_pred == 0)))
    fp = int(np.sum((y_true == 0) & (y_pred == 1)))
    fn = int(np.sum((y_true == 1) & (y_pred == 0)))
    return np.array([[tp, fp], [fn, tn]])


def classification_metrics(conf_matrix: np.ndarray) -> dict:
    """Accuracy / precision / recall / F1 from the standard confusion matrix,
    with the reference's exact formulas (``audio_gru_whole.py:223-226``).

    Division by zero propagates as in the reference (raises/returns nan);
    callers that need NaN-safety use :func:`safe_classification_metrics`.
    """
    cm = np.asarray(conf_matrix, dtype=np.float64)
    accuracy = float(cm[0][0] + cm[1][1]) / np.sum(cm)
    precision = float(cm[0][0]) / (cm[0][0] + cm[0][1])
    recall = float(cm[0][0]) / (cm[0][0] + cm[1][0])
    f1 = 2 * (precision * recall) / (precision + recall)
    return {
        "accuracy": float(accuracy),
        "precision": float(precision),
        "recall": float(recall),
        "f1": float(f1),
    }


def safe_classification_metrics(conf_matrix: np.ndarray) -> dict:
    """NaN→0 variant used by the traditional-classifier baselines
    (``Classification/AudioTraditionalClassifiers.py:112-114``)."""
    with np.errstate(divide="ignore", invalid="ignore"):
        m = classification_metrics(conf_matrix)
    return {k: (0.0 if not np.isfinite(v) else v) for k, v in m.items()}


def fold_mean(results, keys) -> dict:
    """Mean of per-fold metric dicts over ``keys`` (one definition shared
    by the checking harness and the traditional baselines)."""
    return {k: float(np.mean([r[k] for r in results])) for k in keys}


def mean_absolute_error(y_true, y_pred) -> float:
    y_true = np.asarray(y_true, dtype=np.float64).ravel()
    y_pred = np.asarray(y_pred, dtype=np.float64).ravel()
    return float(np.mean(np.abs(y_true - y_pred)))


def root_mean_squared_error(y_true, y_pred) -> float:
    y_true = np.asarray(y_true, dtype=np.float64).ravel()
    y_pred = np.asarray(y_pred, dtype=np.float64).ravel()
    return float(np.sqrt(np.mean((y_true - y_pred) ** 2)))


# ---------------------------------------------------------------------------
# Device (jnp) — used inside jitted training/eval programs
# ---------------------------------------------------------------------------


def confusion_counts(y_true: jnp.ndarray, y_pred: jnp.ndarray,
                     mask: jnp.ndarray | None = None):
    """(tp, fp, fn, tn) as f32 scalars; ``mask`` excludes padded rows."""
    y_true = y_true.astype(jnp.int32).ravel()
    y_pred = y_pred.astype(jnp.int32).ravel()
    if mask is None:
        mask = jnp.ones_like(y_true, dtype=jnp.float32)
    else:
        mask = mask.astype(jnp.float32).ravel()
    tp = jnp.sum(mask * ((y_true == 1) & (y_pred == 1)))
    fp = jnp.sum(mask * ((y_true == 0) & (y_pred == 1)))
    fn = jnp.sum(mask * ((y_true == 1) & (y_pred == 0)))
    tn = jnp.sum(mask * ((y_true == 0) & (y_pred == 0)))
    return tp, fp, fn, tn


def f1_from_counts(tp, fp, fn, tn):
    """accuracy, precision, recall, f1 on device.

    Zero denominators yield 0 (the host path would yield nan/inf; the gating
    comparisons ``f1 > floor`` treat both identically since nan fails any
    comparison and 0 fails the floor)."""
    total = tp + fp + fn + tn
    accuracy = jnp.where(total > 0, (tp + tn) / jnp.maximum(total, 1.0), 0.0)
    precision = jnp.where(tp + fp > 0, tp / jnp.maximum(tp + fp, 1.0), 0.0)
    recall = jnp.where(tp + fn > 0, tp / jnp.maximum(tp + fn, 1.0), 0.0)
    denom = precision + recall
    f1 = jnp.where(denom > 0, 2 * precision * recall / jnp.maximum(denom, 1e-12), 0.0)
    return accuracy, precision, recall, f1


def masked_mae(y_true: jnp.ndarray, y_pred: jnp.ndarray,
               mask: jnp.ndarray | None = None):
    y_true = y_true.astype(jnp.float32).ravel()
    y_pred = y_pred.astype(jnp.float32).ravel()
    if mask is None:
        return jnp.mean(jnp.abs(y_true - y_pred))
    mask = mask.astype(jnp.float32).ravel()
    n = jnp.maximum(jnp.sum(mask), 1.0)
    return jnp.sum(mask * jnp.abs(y_true - y_pred)) / n


def masked_rmse(y_true: jnp.ndarray, y_pred: jnp.ndarray,
                mask: jnp.ndarray | None = None):
    y_true = y_true.astype(jnp.float32).ravel()
    y_pred = y_pred.astype(jnp.float32).ravel()
    if mask is None:
        return jnp.sqrt(jnp.mean((y_true - y_pred) ** 2))
    mask = mask.astype(jnp.float32).ravel()
    n = jnp.maximum(jnp.sum(mask), 1.0)
    return jnp.sqrt(jnp.sum(mask * (y_true - y_pred) ** 2) / n)
