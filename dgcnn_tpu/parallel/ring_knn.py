"""Ring kNN: point-axis-sharded neighbour search over the device mesh.

The reference scales point count purely by host-side spatial tiling
(SURVEY.md §5 "long-context"); blocks are capped at N=7000 because the
O(N²) kNN must fit one device. This primitive removes that cap: the point
axis is sharded over the mesh's 'points' axis and candidate shards rotate
around the ring (``lax.ppermute`` → ICI neighbour hops, ring-attention
style). Each device keeps a running k-best merged with ``lax.top_k`` per
hop, so peak memory is O(N_local² ) and every hop's distance matmul
overlaps the next shard's transfer under XLA's scheduler.

Whole-tile inference at N = D x 7000 becomes one jitted program instead of
D sequential host-tiled forwards.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P


def _score_merge(q, cand, shard_id, n_local, k, best):
    """Score one candidate shard against the local queries and merge into
    the running k-best. ``best`` is (scores, global_idx) or None."""
    offset = shard_id * n_local
    cnorm = jnp.sum(cand * cand, axis=-1)                      # (B, Nl)
    scores = 2.0 * jnp.einsum(
        "bqc,bnc->bqn", q, cand, preferred_element_type=jnp.float32,
        # the ring claims EXACT kNN: the TPU default matmul truncates f32
        # operands to bf16 (scripts/exp_dot_precision_probe.py)
        precision=jax.lax.Precision.HIGHEST,
    ) - cnorm[:, None, :]
    kk = min(k, n_local)
    s, idx = jax.lax.top_k(scores, kk)                         # local idx
    gi = idx.astype(jnp.int32) + offset
    if best is None:
        best_s, best_i = s, gi
    else:
        all_s = jnp.concatenate([best[0], s], axis=-1)
        all_i = jnp.concatenate([best[1], gi], axis=-1)
        best_s, pos = jax.lax.top_k(all_s, k)
        best_i = jnp.take_along_axis(all_i, pos, axis=-1)
    if best_s.shape[-1] < k:  # first hops with n_local < k
        pad = k - best_s.shape[-1]
        best_s = jnp.pad(best_s, ((0, 0), (0, 0), (0, pad)),
                         constant_values=-jnp.inf)
        best_i = jnp.pad(best_i, ((0, 0), (0, 0), (0, pad)))
    return best_s, best_i


def ring_knn_local(
    x_local: jax.Array,
    k: int,
    axis_name: str = "points",
    band_shards: int = 0,
    certify: bool = True,
    sorted_ok: jax.Array | None = None,
    with_flag: bool = False,
) -> "jax.Array | tuple[jax.Array, jax.Array]":
    """Per-shard body: global kNN indices for this device's query points.

    Must run inside ``shard_map`` with ``axis_name`` mapped. ``x_local`` is
    (B, N_local, C); returns (B, N_local, k) *global* point indices.

    ``band_shards=s > 0`` visits only the 2s+1 ring-adjacent shards
    instead of all d — O(N·band) instead of O(N²/d) per shard, the
    sequence-parallel analogue of the banded Pallas kernels
    (kernels/knn_pallas.py). Soundness mirrors them:

    - ``certify=True`` (coordinate space): requires the GLOBAL point
      order to be x-sorted (column 0). Each query's kth-best distance is
      checked against the squared x-gap to the nearest UNvisited shard's
      boundary (sound: any metric over a dim superset of x is >= the
      x-axis distance), with a conservative f32-cancellation margin on
      the score-derived distance. Unsorted input, boundary overlap, or
      any failed certificate falls the WHOLE call back to the exact full
      ring via ``lax.cond`` (uniform predicate — every device takes the
      same branch), so the result is always exact.
    - ``certify=False`` (learned feature space — no sound certificate
      exists): trusts the caller-computed ``sorted_ok`` flag about the
      underlying COORDINATES and bands without a certificate, the same
      trained-model-evidenced class as knn_pallas_feature_banded;
      falls back to the full ring when ``sorted_ok`` is False.

    ``with_flag=True`` also returns the uniform in-band flag (True iff
    the banded result was kept), so downstream ring gathers can take the
    matching banded/full path.
    """
    d = jax.lax.axis_size(axis_name)
    me = jax.lax.axis_index(axis_name)
    n_local = x_local.shape[1]
    q = x_local.astype(jnp.float32)
    perm_fwd = [(j, (j + 1) % d) for j in range(d)]

    def _full_ring(q):
        best = None
        cand = q
        for step in range(d):
            # after `step` forward rotations we hold the shard that
            # started on device (me - step) mod d
            best = _score_merge(q, cand, (me - step) % d, n_local, k, best)
            if step + 1 < d:
                cand = jax.lax.ppermute(cand, axis_name, perm_fwd)
        return best[1]

    s = band_shards
    if s <= 0 or 2 * s + 1 >= d:
        out = _full_ring(q)
        return (out, jnp.asarray(False)) if with_flag else out

    perm_rev = [((j + 1) % d, j) for j in range(d)]
    xs = q[..., 0]                                       # (B, Nl)

    # sortedness pre-gate (uniform): unsorted input skips the banded
    # scoring entirely instead of paying banded + fallback every call
    if certify:
        bmin = jnp.min(xs, axis=1)                       # (B,)
        bmax = jnp.max(xs, axis=1)
        bounds = jax.lax.all_gather(
            jnp.stack([bmin, bmax]), axis_name)          # (d, 2, B)
        gmin, gmax = bounds[:, 0], bounds[:, 1]          # (d, B)
        gate = (jnp.all(xs[:, 1:] >= xs[:, :-1])
                & jnp.all(gmax[:-1] <= gmin[1:]))
    else:
        gate = (sorted_ok if sorted_ok is not None
                else jnp.asarray(False))
    gate = jnp.asarray(
        jax.lax.pmin(gate.astype(jnp.int32), axis_name), jnp.bool_)

    def _banded(q):
        best = _score_merge(q, q, me, n_local, k, None)
        ca = cb = q
        for t in range(1, s + 1):
            ca = jax.lax.ppermute(ca, axis_name, perm_fwd)  # shard me - t
            best = _score_merge(q, ca, (me - t) % d, n_local, k, best)
            cb = jax.lax.ppermute(cb, axis_name, perm_rev)  # shard me + t
            best = _score_merge(q, cb, (me + t) % d, n_local, k, best)
        best_s, best_i = best
        if not certify:
            # flag derived from q through the same pmin chain as the
            # certified branch / _full_flagged so every cond pairing
            # carries the same varying-manual-axes type (always True)
            return best_i, jnp.asarray(
                jax.lax.pmin(
                    (jnp.nan_to_num(q[0, 0, 0]) == jnp.nan_to_num(q[0, 0, 0])).astype(jnp.int32),
                    axis_name), jnp.bool_)
        # per-query certificate against the nearest UNvisited x on each
        # side (±inf when the band covers that side)
        li = me - s - 1
        ri = me + s + 1
        lb = jnp.where(li >= 0, gmax[jnp.clip(li, 0, d - 1)], -jnp.inf)
        rb = jnp.where(ri <= d - 1, gmin[jnp.clip(ri, 0, d - 1)], jnp.inf)
        gap = jnp.minimum(
            jnp.maximum(xs - lb[:, None], 0.0),
            jnp.maximum(rb[:, None] - xs, 0.0),
        )
        qnorm = jnp.sum(q * q, axis=-1)                  # (B, Nl)
        dk2 = qnorm - best_s[..., -1]       # kth-best actual distance²
        # conservative margin for the 2q·c-|c|² f32 cancellation (the
        # kernel-side analogue is the banded Pallas kernel's one-quantum
        # floor margin): the score's rounding error scales with the
        # CANDIDATE magnitude too, so include the score term, not just
        # qnorm; -inf-padded scores give dk2=+inf → cert fails
        margin = 32.0 * 1.2e-7 * (
            qnorm + jnp.abs(best_s[..., -1]) + 1.0)
        cert = dk2 + margin < gap * gap
        ok = jnp.asarray(
            jax.lax.pmin(jnp.all(cert).astype(jnp.int32), axis_name),
            jnp.bool_)
        return jax.lax.cond(ok, lambda q: best_i, _full_ring, q), ok

    def _full_flagged(q):
        # flag derived from q through the same pmin chain as the banded
        # branch's certificate flag, so both cond branches carry the
        # same varying-manual-axes type (always False)
        f = jnp.asarray(
            jax.lax.pmin((jnp.nan_to_num(q[0, 0, 0]) != jnp.nan_to_num(q[0, 0, 0])).astype(jnp.int32),
                         axis_name), jnp.bool_)
        return _full_ring(q), f

    out, ok = jax.lax.cond(gate, _banded, _full_flagged, q)
    return (out, ok) if with_flag else out


def global_sorted_x(x_local: jax.Array, axis_name: str = "points"):
    """Traced bool (uniform across the ring): is column 0 globally
    non-decreasing — each shard locally sorted AND the shard x-intervals
    monotone around the ring? Used to gate the UNcertified feature-space
    ring banding on the underlying coordinate order."""
    xs = x_local[..., 0]
    bounds = jax.lax.all_gather(
        jnp.stack([jnp.min(xs, axis=1), jnp.max(xs, axis=1)]), axis_name)
    ok = (jnp.all(xs[:, 1:] >= xs[:, :-1])
          & jnp.all(bounds[:-1, 1] <= bounds[1:, 0]))
    return jnp.asarray(
        jax.lax.pmin(ok.astype(jnp.int32), axis_name), jnp.bool_)


@functools.partial(jax.jit, static_argnames=("k", "mesh", "band_shards"))
def knn_sharded(
    x: jax.Array, k: int, mesh: Mesh, band_shards: int = 0
) -> jax.Array:
    """Global exact kNN with the point axis sharded over mesh axis 'points'
    (batch over 'data'). x: (B, N, C), N divisible by the points-axis size.

    Returns (B, N, k) int32 global indices (neighbour sets identical to
    single-device knn; within-set order may differ where distances tie
    across shard boundaries).
    """
    n = x.shape[1]
    n_shards = mesh.shape["points"]
    if n % n_shards:
        raise ValueError(f"N={n} not divisible by points axis {n_shards}")
    body = functools.partial(ring_knn_local, k=k, axis_name="points",
                             band_shards=band_shards)
    spec = P("data", "points", None)
    out = jax.shard_map(
        body, mesh=mesh, in_specs=(spec,), out_specs=spec,
    )(x)
    return out
