"""Classification metrics (reference util/metrics.py:4-26) + mIoU for
segmentation (reference vendored mmseg mean_iou), all as pure jnp/numpy."""

from __future__ import annotations

from typing import Sequence, Tuple

import jax.numpy as jnp
import numpy as np


def topk_accuracy(logits, labels, topk: Sequence[int] = (1,)):
    """Top-k accuracy in percent (reference util/metrics.py:4-11)."""
    maxk = max(topk)
    # top-maxk predictions per row
    pred = jnp.argsort(logits, axis=-1)[:, ::-1][:, :maxk]
    correct = pred == labels[:, None]
    return [float(correct[:, :k].any(axis=1).mean() * 100.0) for k in topk]


def mean_per_class_accuracy(logits, labels, num_classes: int) -> float:
    """Mean per-class recall in percent (reference util/metrics.py:14-26).

    The reference averages recall over ALL ``num_classes`` — a class absent
    from ``labels`` contributes 0 (tp=0 over a denominator clamped to 1,
    util/metrics.py:24) — so an eval split missing a class lowers the
    metric.  Matched exactly (executed-parity test in
    tests/test_reference_optim_executed.py)."""
    pred = np.asarray(jnp.argmax(logits, axis=-1))
    labels = np.asarray(labels)
    recall = np.zeros(num_classes, dtype=np.float64)
    for c in range(num_classes):
        mask = labels == c
        if mask.any():
            recall[c] = (pred[mask] == c).mean()
    return float(recall.mean() * 100.0)


def confusion_matrix(pred: np.ndarray, label: np.ndarray,
                     num_classes: int, ignore_index: int = 255) -> np.ndarray:
    """Pixel confusion matrix for segmentation."""
    mask = label != ignore_index
    pred, label = pred[mask], label[mask]
    idx = label.astype(np.int64) * num_classes + pred.astype(np.int64)
    cm = np.bincount(idx, minlength=num_classes * num_classes)
    return cm.reshape(num_classes, num_classes)


def miou_from_confusion(cm: np.ndarray) -> Tuple[float, np.ndarray]:
    """mIoU + per-class IoU from an accumulated confusion matrix
    (reference mmseg/core/evaluation/metrics.py mean_iou semantics)."""
    inter = np.diag(cm).astype(np.float64)
    union = cm.sum(0) + cm.sum(1) - np.diag(cm)
    iou = np.where(union > 0, inter / np.maximum(union, 1), np.nan)
    return float(np.nanmean(iou) * 100.0), iou * 100.0
