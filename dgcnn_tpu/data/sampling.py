"""Class-balanced point sampling and training masks.

Reference semantics (/root/reference/data.py:80-143), reimplemented
vectorised and with explicit deterministic PRNG:

* ``sample_point_indices`` — draw ``n`` points without replacement with
  per-point weight inversely proportional to the point's class share
  (data.py:107-143). Uses the Gumbel-top-k trick (argmax of
  ``log w + Gumbel`` iid is an exact sequential weighted draw without
  replacement), which vectorises where ``np.random.choice(replace=False)``
  is an O(n) sequential loop.
* ``create_train_mask`` — mark ``m`` random points of every (non-excluded)
  class where ``m = min(min class count, floor(total/num_classes))``
  (data.py:80-105) — the loss-side class-balancing mechanism. The reference
  computed the mask on full-room labels but applied it to sampled batch
  points (a latent indexing bug, SURVEY.md §2); the intended semantics —
  implemented here — mask the points actually present in the sample.
"""

from __future__ import annotations

import numpy as np


def class_counts(labels: np.ndarray, num_classes: int) -> np.ndarray:
    """Per-class point counts (classes are 0..num_classes-1)."""
    return np.bincount(
        labels.astype(np.int64).ravel(), minlength=num_classes
    )[:num_classes].astype(np.float64)


def inverse_class_weights(
    labels: np.ndarray, num_classes: int
) -> np.ndarray:
    """Per-point sampling weights ∝ (total - count(class(p))), normalised
    (/root/reference/data.py:117-134; uniform fallback when degenerate)."""
    counts = class_counts(labels, num_classes)
    tot = counts.sum()
    class_w = tot - counts
    s = class_w.sum()
    if s <= 0 or not np.isfinite(s):
        return np.full(labels.shape, 1.0 / max(len(labels), 1))
    class_w = class_w / s
    w = class_w[labels.astype(np.int64)]
    ws = w.sum()
    if ws <= 0 or not np.isfinite(ws):
        return np.full(labels.shape, 1.0 / max(len(labels), 1))
    return w / ws


def weighted_choice_no_replacement(
    rng: np.random.Generator, weights: np.ndarray, n: int
) -> np.ndarray:
    """Gumbel-top-k weighted sampling without replacement.

    Exactly equivalent in distribution to sequential
    ``np.random.choice(p=weights, replace=False)`` but one vectorised pass.
    Zero-weight points are never selected (unless n exceeds the number of
    positive-weight points, in which case they fill the tail).
    """
    if n > len(weights):
        raise ValueError(f"cannot draw {n} from {len(weights)} points")
    logw = np.full(weights.shape, -np.inf)
    pos = weights > 0
    logw[pos] = np.log(weights[pos])
    gumbel = rng.gumbel(size=weights.shape)
    keys = logw + gumbel
    # -inf + gumbel = -inf keeps zero-weight points last
    return np.argpartition(-keys, n - 1)[:n]


def sample_point_indices(
    rng: np.random.Generator,
    labels: np.ndarray,
    num_classes: int,
    n: int,
) -> np.ndarray:
    """Inverse-class-frequency weighted subsample of ``n`` point indices
    (/root/reference/data.py:107-143)."""
    w = inverse_class_weights(labels, num_classes)
    return weighted_choice_no_replacement(rng, w, n)


def create_train_mask(
    rng: np.random.Generator,
    labels: np.ndarray,
    num_classes: int,
    exclude_classes: tuple[int, ...] = (),
    tot_samples: int | None = None,
) -> np.ndarray:
    """Binary loss mask flagging equal random per-class point budgets
    (/root/reference/data.py:80-105).

    m = min(smallest non-excluded class count, floor(tot/num_classes));
    m random points of every non-excluded class present get mask 1.
    """
    labels = labels.astype(np.int64).ravel()
    if tot_samples is None:
        tot_samples = len(labels)
    counts = class_counts(labels, num_classes)
    considered = [
        c for c in range(num_classes) if c not in exclude_classes
    ]
    nonzero = [counts[c] for c in considered]
    if not nonzero:
        return np.zeros(labels.shape, np.float32)
    m = int(min(min(nonzero), np.floor(tot_samples / num_classes)))
    mask = np.zeros(labels.shape, np.float32)
    if m <= 0:
        return mask
    for c in considered:
        idxs = np.flatnonzero(labels == c)
        if len(idxs) == 0:
            continue
        chosen = rng.choice(idxs, size=min(m, len(idxs)), replace=False)
        mask[chosen] = 1.0
    return mask
