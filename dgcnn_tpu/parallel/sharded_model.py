"""Point-axis-sharded DGCNN inference (sequence parallelism).

The reference caps blocks at N=7000 because its O(N²) kNN and the dense
feature tensors must fit one device (SURVEY.md §5 "long-context"). This
module runs the *entire eval forward* with the point axis sharded over the
mesh's 'points' axis:

* kNN: ring candidate rotation (parallel/ring_knn.py) — exact global
  neighbours, O(N_local²) peak memory;
* neighbour gather: the same ring — each hop gathers locally from the
  visiting shard for the indices that live on it and mask-accumulates;
* global max-pool: local max + ``lax.pmax`` over the points axis;
* everything else (1×1 convs, eval BatchNorm, LeakyReLU) is per-point and
  needs no communication.

Training is supported too (:func:`make_sharded_train_step`): BatchNorm
batch statistics are psum'd over BOTH mesh axes (matching the global-batch
semantics of the jit data-parallel path), the global max-pool uses a
differentiable ``all_gather`` + max (``pmax`` has no transpose rule), the
masked loss / confusion matrix are psum'd, and gradients flow through the
``shard_map`` (ppermute/psum transposes) back to the replicated params.
Outputs are bit-identical to the unsharded forward up to kNN tie order
across shard boundaries and float reassociation in the psummed reductions
(tests compare on tie-free data at 1e-5).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from dgcnn_tpu.models.dgcnn import (
    _BN_EPS,
    _BN_MOMENTUM,
    DGCNNConfig,
    _batch_norm,
    _lrelu,
    _mm,
)
from dgcnn_tpu.ops.edgeconv import gather_neighbors
from dgcnn_tpu.parallel.ring_knn import global_sorted_x, ring_knn_local

AXIS = "points"
_BOTH = ("data", AXIS)


def _ring_gather(
    feats_local: jax.Array,
    gidx: jax.Array,
    band_shards: int = 0,
    inband: jax.Array | None = None,
) -> jax.Array:
    """Gather per-neighbour features for *global* indices under sharding.

    feats_local: (B, Nl, C) this shard's features.
    gidx: (B, Nl, k) global point indices (any shard).
    Returns (B, Nl, k, C).

    ``band_shards=s`` with ``inband`` (the uniform flag returned by the
    banded ring kNN) visits only the 2s+1 ring-adjacent shards when the
    indices are known to lie in-band, falling back to the full ring
    otherwise — the two paths are selected by the SAME flag that chose
    the kNN path, so gathered rows are always found.
    """
    d = jax.lax.axis_size(AXIS)
    me = jax.lax.axis_index(AXIS)
    b, nl, c = feats_local.shape
    k = gidx.shape[-1]
    perm_fwd = [(j, (j + 1) % d) for j in range(d)]

    def merge(acc, cand, shard_id):
        local = gidx - shard_id * nl
        hit = (local >= 0) & (local < nl)
        safe = jnp.clip(local, 0, nl - 1)
        g = gather_neighbors(cand, safe)
        return jnp.where(hit[..., None], g, acc)

    def full(feats):
        acc = jnp.zeros((b, nl, k, c), feats.dtype)
        cand = feats
        for step in range(d):
            acc = merge(acc, cand, (me - step) % d)
            if step + 1 < d:
                cand = jax.lax.ppermute(cand, AXIS, perm_fwd)
        return acc

    s = band_shards
    if s <= 0 or 2 * s + 1 >= d or inband is None:
        return full(feats_local)
    perm_rev = [((j + 1) % d, j) for j in range(d)]

    def banded(feats):
        acc = merge(jnp.zeros((b, nl, k, c), feats.dtype), feats, me)
        ca = cb = feats
        for t in range(1, s + 1):
            ca = jax.lax.ppermute(ca, AXIS, perm_fwd)    # shard me - t
            acc = merge(acc, ca, (me - t) % d)
            cb = jax.lax.ppermute(cb, AXIS, perm_rev)    # shard me + t
            acc = merge(acc, cb, (me + t) % d)
        return acc

    return jax.lax.cond(inband, banded, full, feats_local)


def _ring_knn_stage(x, cfg, *, spatial, sorted_flag):
    """Stage kNN over the ring: spatial stage 1 bands CERTIFIED
    (cfg.ring_band_shards; exact — failed certificates fall back to the
    full ring), feature stages 2-3 band UNcertified only when opted in
    (cfg.ring_band_feature_shards) and the coordinates are globally
    x-sorted (``sorted_flag``). Returns (global idx, uniform in-band
    flag, band_shards) — feed the latter two to :func:`_ring_gather` so
    the gather skips the same shards the kNN did."""
    s = cfg.ring_band_shards if spatial else cfg.ring_band_feature_shards
    idx, inband = ring_knn_local(
        x, cfg.k, AXIS, band_shards=s, certify=spatial,
        sorted_ok=None if spatial else sorted_flag, with_flag=True)
    return idx, inband, s


def _edge_stage_sharded(x, params, state, names, cfg, sorted_flag=None):
    """Two-conv EdgeConv stage under point sharding (eval BN)."""
    conv_a, bn_a, conv_b, bn_b = names
    w = params[conv_a]["w"]
    c = x.shape[-1]
    w_d, w_x = w[:c], w[c:]
    idx, inband, bs = _ring_knn_stage(x, cfg, spatial=conv_a == "conv1",
                                      sorted_flag=sorted_flag)
    a = _mm(x, w_d, cfg._cdtype)
    bvec = _mm(x, w_x - w_d, cfg._cdtype)
    e = _ring_gather(a, idx, bs, inband) + bvec[:, :, None, :]
    e, _ = _batch_norm(e, params[bn_a], state[bn_a], train=False)
    e = _lrelu(e)
    e = _mm(e, params[conv_b]["w"], cfg._cdtype)
    e, _ = _batch_norm(e, params[bn_b], state[bn_b], train=False)
    return jnp.max(_lrelu(e), axis=2)


def _edge_stage3_sharded(x, params, state, cfg, sorted_flag=None):
    """Single-conv stage with the max-through-BN fold (eval)."""
    w = params["conv5"]["w"]
    c = x.shape[-1]
    w_d, w_x = w[:c], w[c:]
    idx, inband, bs = _ring_knn_stage(x, cfg, spatial=False,
                                      sorted_flag=sorted_flag)
    a = _mm(x, w_d, cfg._cdtype)
    bvec = _mm(x, w_x - w_d, cfg._cdtype)
    nbr = _ring_gather(a, idx, bs, inband)
    mx = jnp.max(nbr, axis=2) + bvec
    mn = jnp.min(nbr, axis=2) + bvec
    sel = jnp.where(params["bn5"]["gamma"] >= 0, mx, mn)
    y, _ = _batch_norm(sel, params["bn5"], state["bn5"], train=False)
    return _lrelu(y)


def _forward_local(params, state, x, cfg: DGCNNConfig):
    """shard_map body: x (B, N_local, F) -> logits (B, N_local, C)."""
    sorted_flag = (global_sorted_x(x, AXIS)
                   if cfg.ring_band_feature_shards else None)
    x1 = _edge_stage_sharded(
        x, params, state, ("conv1", "bn1", "conv2", "bn2"), cfg,
        sorted_flag=sorted_flag,
    )
    x2 = _edge_stage_sharded(
        x1, params, state, ("conv3", "bn3", "conv4", "bn4"), cfg,
        sorted_flag=sorted_flag,
    )
    x3 = _edge_stage3_sharded(x2, params, state, cfg,
                              sorted_flag=sorted_flag)

    locals_ = jnp.concatenate([x1, x2, x3], axis=-1)
    emb = _mm(locals_, params["conv6"]["w"], cfg._cdtype)
    emb, _ = _batch_norm(emb, params["bn6"], state["bn6"], train=False)
    emb = _lrelu(emb)
    glob = jnp.max(emb, axis=1)                     # (B, emb) local
    glob = jax.lax.pmax(glob, AXIS)                 # global over all points

    n_local = x.shape[1]
    g = jnp.broadcast_to(
        glob[:, None, :], (x.shape[0], n_local, cfg.emb_dims)
    )
    h = jnp.concatenate([g, x1, x2, x3], axis=-1)
    h = _mm(h, params["conv7"]["w"], cfg._cdtype)
    h, _ = _batch_norm(h, params["bn7"], state["bn7"], train=False)
    h = _lrelu(h)
    h = _mm(h, params["conv8"]["w"], cfg._cdtype)
    h, _ = _batch_norm(h, params["bn8"], state["bn8"], train=False)
    h = _lrelu(h)
    return _mm(h, params["conv9"]["w"], cfg._cdtype)


def _batch_norm_train_sharded(x, p, s, *, one_pass: bool = True):
    """Training BatchNorm with batch statistics psum'd over the full mesh.

    Matches the semantics of models.dgcnn._batch_norm (biased var for
    normalisation, unbiased for the running update) computed over the
    GLOBAL batch. ``one_pass`` (cfg.bn_stats="one_pass", the default)
    computes var = E[x**2] - E[x]**2 so sum(x) and sum(x**2) ride a single
    psum; "two_pass" is the literal torch reduction order (mean first,
    then E[(x-mean)**2]) at the cost of a second collective + sweep."""
    axes = tuple(range(x.ndim - 1))
    n_repl = 1
    for a in _BOTH:
        n_repl *= jax.lax.axis_size(a)
    count = (x.size // x.shape[-1]) * n_repl
    if one_pass:
        sums = jax.lax.psum(
            jnp.stack([jnp.sum(x, axis=axes),
                       jnp.sum(jnp.square(x), axis=axes)]), _BOTH)
        mean = sums[0] / count
        var = jnp.maximum(sums[1] / count - jnp.square(mean), 0.0)
    else:
        mean = jax.lax.psum(jnp.sum(x, axis=axes), _BOTH) / count
        var = jax.lax.psum(
            jnp.sum(jnp.square(x - mean), axis=axes), _BOTH) / count
    unbiased = var * (count / max(count - 1, 1))
    new_s = {
        "mean": (1 - _BN_MOMENTUM) * s["mean"] + _BN_MOMENTUM * mean,
        "var": (1 - _BN_MOMENTUM) * s["var"] + _BN_MOMENTUM * unbiased,
    }
    inv = jax.lax.rsqrt(var + _BN_EPS)
    return (x - mean) * (inv * p["gamma"]) + p["beta"], new_s


def _edge_stage_sharded_train(x, params, state, names, cfg,
                              sorted_flag=None):
    """Two-conv EdgeConv stage, training mode (psum'd BN stats)."""
    conv_a, bn_a, conv_b, bn_b = names
    w = params[conv_a]["w"]
    c = x.shape[-1]
    w_d, w_x = w[:c], w[c:]
    idx, inband, bs = _ring_knn_stage(x, cfg, spatial=conv_a == "conv1",
                                      sorted_flag=sorted_flag)
    a = _mm(x, w_d, cfg._cdtype)
    bvec = _mm(x, w_x - w_d, cfg._cdtype)
    e = _ring_gather(a, idx, bs, inband) + bvec[:, :, None, :]
    op = cfg.bn_stats == "one_pass"
    e, s_a = _batch_norm_train_sharded(e, params[bn_a], state[bn_a],
                                       one_pass=op)
    e = _lrelu(e)
    e = _mm(e, params[conv_b]["w"], cfg._cdtype)
    e, s_b = _batch_norm_train_sharded(e, params[bn_b], state[bn_b],
                                       one_pass=op)
    return jnp.max(_lrelu(e), axis=2), {bn_a: s_a, bn_b: s_b}


def _forward_local_train(params, state, x, rng, cfg: DGCNNConfig):
    """shard_map training forward: (B_l, N_l, F) -> (logits, new_bn_state).

    Dropout draws per-shard from ``rng`` folded with the shard's linear
    mesh position — statistically equivalent to (but not bitwise the same
    as) the unsharded pattern; grad-parity tests run with dropout=0.
    """
    new_state = dict(state)
    sorted_flag = (global_sorted_x(x, AXIS)
                   if cfg.ring_band_feature_shards else None)
    x1, upd = _edge_stage_sharded_train(
        x, params, state, ("conv1", "bn1", "conv2", "bn2"), cfg,
        sorted_flag=sorted_flag,
    )
    new_state.update(upd)
    x2, upd = _edge_stage_sharded_train(
        x1, params, state, ("conv3", "bn3", "conv4", "bn4"), cfg,
        sorted_flag=sorted_flag,
    )
    new_state.update(upd)
    # stage 3: single conv, training BN over (B, N, k)
    w = params["conv5"]["w"]
    c = x2.shape[-1]
    w_d, w_x = w[:c], w[c:]
    idx, inband, bs = _ring_knn_stage(x2, cfg, spatial=False,
                                      sorted_flag=sorted_flag)
    a = _mm(x2, w_d, cfg._cdtype)
    bvec = _mm(x2, w_x - w_d, cfg._cdtype)
    e = _ring_gather(a, idx, bs, inband) + bvec[:, :, None, :]
    op = cfg.bn_stats == "one_pass"
    e, s5 = _batch_norm_train_sharded(e, params["bn5"], state["bn5"],
                                      one_pass=op)
    x3 = jnp.max(_lrelu(e), axis=2)
    new_state["bn5"] = s5

    locals_ = jnp.concatenate([x1, x2, x3], axis=-1)
    emb = _mm(locals_, params["conv6"]["w"], cfg._cdtype)
    emb, s6 = _batch_norm_train_sharded(emb, params["bn6"], state["bn6"], one_pass=op)
    emb = _lrelu(emb)
    new_state["bn6"] = s6
    # global max over the sharded point axis: all_gather (differentiable;
    # pmax has no transpose rule) then max over shards
    loc = jnp.max(emb, axis=1)                              # (B_l, emb)
    glob = jnp.max(jax.lax.all_gather(loc, AXIS), axis=0)   # (B_l, emb)

    n_local = x.shape[1]
    g = jnp.broadcast_to(
        glob[:, None, :], (x.shape[0], n_local, cfg.emb_dims)
    )
    h = jnp.concatenate([g, x1, x2, x3], axis=-1)
    h = _mm(h, params["conv7"]["w"], cfg._cdtype)
    h, s7 = _batch_norm_train_sharded(h, params["bn7"], state["bn7"], one_pass=op)
    h = _lrelu(h)
    new_state["bn7"] = s7
    h = _mm(h, params["conv8"]["w"], cfg._cdtype)
    h, s8 = _batch_norm_train_sharded(h, params["bn8"], state["bn8"], one_pass=op)
    h = _lrelu(h)
    new_state["bn8"] = s8

    if cfg.dropout > 0.0:
        me = (jax.lax.axis_index("data") * jax.lax.axis_size(AXIS)
              + jax.lax.axis_index(AXIS))
        keep = 1.0 - cfg.dropout
        dmask = jax.random.bernoulli(
            jax.random.fold_in(rng, me), keep, h.shape
        )
        h = jnp.where(dmask, h / keep, 0.0)
    logits = _mm(h, params["conv9"]["w"], cfg._cdtype)
    return logits, new_state


def make_sharded_train_step(
    cfg: DGCNNConfig,
    tx,
    mesh: Mesh,
    *,
    smoothing: bool = True,
    donate: bool = False,
):
    """Jitted train step with the point axis sharded over mesh axis 'points'
    and the batch over 'data' (sequence parallelism for blocks too large
    for one chip — SURVEY.md §5 long-context plan).

    Takes ``(state, points (B,N,F), labels (B,N), mask (B,N))`` like
    :func:`dgcnn_tpu.train.steps.make_train_step` and returns
    ``(new_state, {'loss', 'confusion'})``. Gradients/metrics are psum'd
    across the whole mesh; params and optimizer state stay replicated.
    """
    import optax

    from dgcnn_tpu.ops.losses import smoothed_ce_per_point
    from dgcnn_tpu.ops.metrics import confusion_matrix
    from dgcnn_tpu.train.steps import TrainState

    spec_x = P("data", AXIS, None)
    spec_l = P("data", AXIS)
    repl = P()

    def body(params, bn_state, points, labels, mask, rng):
        logits, new_bn = _forward_local_train(
            params, bn_state, points, rng, cfg
        )
        # the smoothing formula lives in ops/losses.py (one copy); only
        # the masked reduction is psum'd here
        per_point = smoothed_ce_per_point(logits, labels,
                                          smoothing=smoothing)
        w = mask.astype(per_point.dtype)
        num = jax.lax.psum(jnp.sum(per_point * w), _BOTH)
        den = jax.lax.psum(jnp.sum(w), _BOTH)
        loss = num / jnp.maximum(den, 1.0)
        pred = jnp.argmax(logits, axis=-1)
        cm = jax.lax.psum(
            confusion_matrix(pred, labels, cfg.num_classes, weights=mask),
            _BOTH,
        )
        return loss, new_bn, cm

    smapped = jax.shard_map(
        body,
        mesh=mesh,
        in_specs=(repl, repl, spec_x, spec_l, spec_l, repl),
        out_specs=(repl, repl, repl),
    )

    def loss_fn(params, bn_state, points, labels, mask, rng):
        loss, new_bn, cm = smapped(params, bn_state, points, labels, mask,
                                   rng)
        return loss, (new_bn, cm)

    def step(state: TrainState, points, labels, mask):
        rng, dropout_rng = jax.random.split(state.rng)
        (loss, (new_bn, cm)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.params, state.bn_state, points, labels, mask, dropout_rng)
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        new_state = TrainState(
            params=new_params,
            bn_state=new_bn,
            opt_state=new_opt,
            rng=rng,
            step=state.step + 1,
        )
        return new_state, {"loss": loss, "confusion": cm}

    return jax.jit(step, donate_argnums=(0,) if donate else ())


def make_sharded_eval_step(cfg: DGCNNConfig, mesh: Mesh, *,
                           smoothing: bool = True):
    """Point-sharded analogue of ``train.steps.make_eval_step``: running-
    stat BN forward over the 2-D mesh, masked loss and confusion matrix
    psum'd over both axes. Returns ``{'loss', 'confusion'}`` (the train
    loop's validation contract) — per-point outputs stay sharded inside
    the shard_map and never materialise unsharded."""
    from dgcnn_tpu.ops.losses import smoothed_ce_per_point
    from dgcnn_tpu.ops.metrics import confusion_matrix

    spec_x = P("data", AXIS, None)
    spec_l = P("data", AXIS)
    repl = P()

    def body(params, bn_state, points, labels, mask):
        logits = _forward_local(params, bn_state, points, cfg)
        per_point = smoothed_ce_per_point(logits, labels,
                                          smoothing=smoothing)
        w = mask.astype(per_point.dtype)
        num = jax.lax.psum(jnp.sum(per_point * w), _BOTH)
        den = jax.lax.psum(jnp.sum(w), _BOTH)
        pred = jnp.argmax(logits, axis=-1)
        cm = jax.lax.psum(
            confusion_matrix(pred, labels, cfg.num_classes, weights=mask),
            _BOTH,
        )
        return num / jnp.maximum(den, 1.0), cm

    smapped = jax.shard_map(
        body, mesh=mesh,
        in_specs=(repl, repl, spec_x, spec_l, spec_l),
        out_specs=(repl, repl),
    )

    @jax.jit
    def step(params, bn_state, points, labels, mask=None):
        if mask is None:
            mask = jnp.ones(labels.shape, jnp.float32)
        loss, cm = smapped(params, bn_state, points, labels, mask)
        return {"loss": loss, "confusion": cm}

    return step


@functools.partial(jax.jit, static_argnames=("cfg", "mesh"))
def apply_dgcnn_sharded(
    params,
    state,
    x: jax.Array,
    cfg: DGCNNConfig,
    mesh: Mesh,
) -> jax.Array:
    """Eval forward with points sharded over mesh axis 'points' (batch over
    'data'). x: (B, N, F); N divisible by the points axis; B by the data
    axis. Returns (B, N, C) logits."""
    n = x.shape[1]
    n_sp = mesh.shape[AXIS]
    if n % n_sp:
        raise ValueError(f"N={n} not divisible by points axis {n_sp}")
    body = functools.partial(_forward_local, cfg=cfg)
    spec_x = P("data", AXIS, None)
    repl = P()
    out = jax.shard_map(
        body,
        mesh=mesh,
        in_specs=(repl, repl, spec_x),
        out_specs=spec_x,
    )(params, state, x)
    return out
