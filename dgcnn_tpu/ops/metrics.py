"""Jittable segmentation metrics.

The reference computes accuracy / balanced accuracy with sklearn on host
numpy every batch (/root/reference/train.py:213-222) and per-class IoU with
a Python double loop (/root/reference/util.py:60-76). Here everything is
derived from an integer confusion matrix accumulated *on device* — one
scatter-add per batch — and the scalar metrics are cheap host-side reads at
logging time.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def confusion_matrix(
    pred: jax.Array,
    true: jax.Array,
    num_classes: int,
    weights: jax.Array | None = None,
) -> jax.Array:
    """Confusion matrix counts[true, pred], optionally point-weighted.

    Args:
        pred: (...,) int predicted labels in [0, num_classes).
        true: (...,) int true labels in [0, num_classes). Out-of-range
            entries (e.g. the UNCLASSIFIED=31 low-confidence marker,
            /root/reference/test.py:15) are dropped.
        num_classes: C.
        weights: optional (...,) weights (e.g. validity mask).

    Returns:
        (C, C) float32 counts.
    """
    pred = pred.reshape(-1)
    true = true.reshape(-1)
    valid = (pred >= 0) & (pred < num_classes) & (true >= 0) & (true < num_classes)
    w = valid.astype(jnp.float32)
    if weights is not None:
        w = w * weights.reshape(-1).astype(jnp.float32)
    flat = jnp.where(valid, true * num_classes + pred, 0)
    c2 = num_classes * num_classes
    if c2 <= 1024:
        # one-hot contraction: XLA's scatter-add is row-serial on TPU
        # (~row-latency per point); a (1, M) x (M, C^2) weighted one-hot
        # matmul is a single MXU pass over the points
        oh = (flat[:, None] == jnp.arange(c2, dtype=flat.dtype)[None, :])
        counts = jnp.einsum(
            "m,mc->c", w, oh.astype(jnp.float32),
            preferred_element_type=jnp.float32,
        )
    else:
        counts = jnp.zeros((c2,), jnp.float32).at[flat].add(w)
    return counts.reshape(num_classes, num_classes)


def accuracy_from_confusion(cm: jax.Array) -> jax.Array:
    """Overall accuracy = trace / total."""
    return jnp.trace(cm) / jnp.maximum(jnp.sum(cm), 1.0)


def balanced_accuracy_from_confusion(cm: jax.Array) -> jax.Array:
    """Mean per-class recall over classes present in the ground truth.

    Matches ``sklearn.metrics.balanced_accuracy_score`` (classes absent
    from y_true are excluded from the mean).
    """
    support = jnp.sum(cm, axis=1)
    recall = jnp.diag(cm) / jnp.maximum(support, 1.0)
    present = (support > 0).astype(recall.dtype)
    return jnp.sum(recall * present) / jnp.maximum(jnp.sum(present), 1.0)


def iou_from_confusion(cm: jax.Array) -> jax.Array:
    """Per-class intersection-over-union from a confusion matrix.

    I_c = cm[c, c]; U_c = row_c + col_c - I_c. Equivalent to
    /root/reference/util.py:60-76 aggregated over rooms (NaN where a class
    appears in neither prediction nor truth, as there).
    """
    inter = jnp.diag(cm)
    union = jnp.sum(cm, axis=0) + jnp.sum(cm, axis=1) - inter
    return inter / union


def calculate_sem_iou(pred_rooms, true_rooms, num_classes: int) -> np.ndarray:
    """Host-side per-class IoU over a list of rooms.

    API-compatible with /root/reference/util.py:60-76 (and its duplicate at
    /root/reference/postprocess_data/metrics.py:38-47): takes sequences of
    per-room prediction / ground-truth label arrays.
    """
    inter = np.zeros(num_classes, np.float64)
    union = np.zeros(num_classes, np.float64)
    for pred, true in zip(pred_rooms, true_rooms):
        pred = np.asarray(pred)
        true = np.asarray(true)
        for c in range(num_classes):
            p = pred == c
            t = true == c
            inter[c] += np.sum(p & t)
            union[c] += np.sum(p | t)
    with np.errstate(divide="ignore", invalid="ignore"):
        return inter / union
