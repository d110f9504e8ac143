"""In-graph class-balanced training masks.

Device-side, jittable equivalent of the host sampler
(:func:`dgcnn_tpu.data.sampling.create_train_mask`, reference semantics
/root/reference/data.py:80-105): mark m random points of every
(non-excluded) class, m = min(smallest non-excluded class count,
floor(N / num_classes)). The reference built these masks in per-sample
Python loops on the host (train.py:167-174); this version is one fused
program over the whole (B, N) batch — usable inside the jitted train step
under data parallelism.

Algorithm (no dynamic shapes): sort each row once by ``label + u`` with
u ~ U[0,1) — groups points by class with a random order inside each class —
then the within-class rank is ``arange - group_start`` and the mask is
``rank < m`` scattered back through the sort permutation.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


@functools.partial(jax.jit, static_argnames=("num_classes", "exclude"))
def balanced_train_mask(
    rng: jax.Array,
    labels: jax.Array,
    num_classes: int,
    exclude: tuple[int, ...] = (),
) -> jax.Array:
    """(B, N) float mask with an equal random per-class point budget.

    Args:
        rng: PRNG key.
        labels: (B, N) int class labels in [0, num_classes).
        num_classes: C.
        exclude: classes that receive no mask (and whose counts are ignored
            for the budget), /root/reference/train.py:327-330.

    Returns:
        (B, N) float32 mask in {0, 1}.
    """
    b, n = labels.shape
    labels = labels.astype(jnp.int32)
    u = jax.random.uniform(rng, (b, n))

    counts = jnp.zeros((b, num_classes), jnp.float32).at[
        jnp.arange(b)[:, None], labels
    ].add(1.0)
    considered = jnp.ones((num_classes,), bool)
    for c in exclude:
        considered = considered.at[c].set(False)
    # reference: m = min over ALL non-excluded class counts (absent class
    # -> zero budget), capped at floor(N / C)  (data.py:95-96)
    eff = jnp.where(considered[None, :], counts, jnp.inf)
    m = jnp.minimum(jnp.min(eff, axis=1), jnp.floor(n / num_classes))
    m = m.astype(jnp.int32)  # (B,)

    key = labels.astype(jnp.float32) + u          # sorts by (label, random)
    order = jnp.argsort(key, axis=1)
    sorted_labels = jnp.take_along_axis(labels, order, axis=1)
    pos = jnp.broadcast_to(jnp.arange(n), (b, n))
    is_start = jnp.concatenate(
        [jnp.ones((b, 1), bool),
         sorted_labels[:, 1:] != sorted_labels[:, :-1]],
        axis=1,
    )
    group_start = jax.lax.associative_scan(
        jnp.maximum, jnp.where(is_start, pos, 0), axis=1
    )
    rank = pos - group_start
    sel = (rank < m[:, None]) & considered[sorted_labels]
    mask = jnp.zeros((b, n), jnp.float32).at[
        jnp.arange(b)[:, None], order
    ].set(sel.astype(jnp.float32))
    return mask
