"""Loss functions.

Reference: label-smoothed cross entropy with eps=0.2
(/root/reference/util.py:17-34) and the class-balancing "focus mask"
mechanism of the training loop (/root/reference/train.py:167-197).

Deviations from the reference, per the intended-semantics policy:

* the loss is computed on *logits* (the reference applies softmax first and
  then ``cal_loss``'s log_softmax on probabilities — a documented bug);
* unmasked points simply carry zero weight instead of being remapped to a
  synthetic (num_classes+1)-th "ignore" class whose prediction is a
  constant one-hot (which contributed a parameter-independent term to the
  reference loss and inflated its point count).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def smoothed_ce_per_point(
    logits: jax.Array,
    labels: jax.Array,
    *,
    smoothing: bool = True,
    eps: float = 0.2,
) -> jax.Array:
    """Per-point label-smoothed CE (no reduction) — THE smoothing formula
    (/root/reference/util.py:17-34: true class ``1-eps``, others
    ``eps/(C-1)``). Shared by the scalar losses below and the
    point-sharded trainer (parallel/sharded_model.py), which psums its own
    masked reduction."""
    logp = jax.nn.log_softmax(logits, axis=-1)
    n_class = logits.shape[-1]
    true_logp = jnp.take_along_axis(logp, labels[..., None], axis=-1)[..., 0]
    if not smoothing:
        return -true_logp
    off = eps / (n_class - 1)
    # sum_c w_c * logp_c with w = one_hot*(1-eps) + (1-one_hot)*off
    return -(off * jnp.sum(logp, axis=-1) + (1.0 - eps - off) * true_logp)


def smoothed_cross_entropy(
    logits: jax.Array,
    labels: jax.Array,
    *,
    smoothing: bool = True,
    eps: float = 0.2,
) -> jax.Array:
    """Label-smoothed cross entropy, mean over all points.

    Matches /root/reference/util.py:17-34: the true class gets weight
    ``1 - eps``, every other class ``eps / (n_class - 1)``.

    Args:
        logits: (..., C) unnormalised scores.
        labels: (...,) integer class labels.
        smoothing: plain CE when False.
        eps: smoothing mass moved off the true class.

    Returns:
        scalar mean loss.
    """
    return jnp.mean(
        smoothed_ce_per_point(logits, labels, smoothing=smoothing, eps=eps)
    )


def masked_smoothed_cross_entropy(
    logits: jax.Array,
    labels: jax.Array,
    mask: jax.Array,
    *,
    smoothing: bool = True,
    eps: float = 0.2,
) -> jax.Array:
    """Label-smoothed CE averaged over masked points only.

    The in-graph replacement for the reference's Python-loop focus-label
    remapping (/root/reference/train.py:183-197): points with mask 0 are
    excluded from the loss (the class-balancing mechanism).

    Args:
        logits: (B, N, C).
        labels: (B, N) int.
        mask: (B, N) {0,1} or float weights.

    Returns:
        scalar masked mean loss.
    """
    per_point = smoothed_ce_per_point(
        logits, labels, smoothing=smoothing, eps=eps
    )
    w = mask.astype(per_point.dtype)
    return jnp.sum(per_point * w) / jnp.maximum(jnp.sum(w), 1.0)
