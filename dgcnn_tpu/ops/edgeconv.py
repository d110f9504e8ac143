"""EdgeConv building blocks.

The reference builds explicit edge features ``cat([x_j - x_i, x_i])`` of
shape (B, 2C, N, k) and pushes them through 1×1 convolutions
(/root/reference/model.py:43-83, :116-130). On TPU we exploit that the first
1×1 conv is linear in the edge features: with the conv weight split as
``W = [W_d; W_x]`` (rows acting on the relative part and the centre part),

    cat([x_j - x_i, x_i]) @ W  =  (x @ W_d)[j]  +  (x @ (W_x - W_d))[i]

so the k-expanded matmul collapses to two (N, C)×(C, C') MXU matmuls on the
*point* tensor plus a gather and a broadcast add in C' space. The (B,N,k,2C)
edge tensor is never materialised; only (B,N,k,C') post-conv activations are.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _gather_impl(feats: jax.Array, idx: jax.Array) -> jax.Array:
    import os

    b, n, c = feats.shape
    k = idx.shape[-1]
    if (
        os.environ.get("DGCNN_GATHER_IMPL", "xla") == "pallas"
        and jax.default_backend() == "tpu"
        and feats.dtype == jnp.float32
    ):
        from dgcnn_tpu.kernels.gather_pallas import gather_rows

        return gather_rows(feats, idx.reshape(b, n * k)).reshape(b, n, k, c)
    table = feats.reshape(b * n, c)
    gidx = idx + (jnp.arange(b, dtype=idx.dtype) * n)[:, None, None]
    return table[gidx.reshape(-1)].reshape(b, n, k, c)


@jax.custom_vjp
def gather_neighbors(feats: jax.Array, idx: jax.Array) -> jax.Array:
    """Gather per-neighbour features.

    Uses the flattened-batch global-index formulation (like the reference's
    ``idx + arange(B)*N`` at /root/reference/model.py:64-77): on TPU, XLA
    lowers the single-batch-dim gather ~1.8x faster than the batched
    ``take_along_axis`` form (measured 5.8 ms vs 10.6 ms at
    B=8, N=7000, k=32, C=64).

    Custom VJP: on the TPU backend with f32 features, the backward
    scatter-add runs as the Pallas VMEM-accumulator kernel
    (kernels/scatter_pallas.py — 13.4 ms vs XLA's 26.4 ms per train-step
    stage at B=8, N=7000, k=30, C=64); elsewhere it is XLA's scatter.

    Args:
        feats: (B, N, C).
        idx: (B, N, k) int32 neighbour indices into the N axis.

    Returns:
        (B, N, k, C) neighbour features.
    """
    return _gather_impl(feats, idx)


def _gather_fwd(feats, idx):
    # residuals must be arrays: a zero-width slice carries feats'
    # batch/row-count/dtype without retaining its data
    token = feats[:, :, :0]
    return _gather_impl(feats, idx), (idx, token)


def _gather_bwd(res, dy):
    idx, token = res
    b, n, _ = token.shape
    return scatter_rows_auto(dy, idx, n, token.dtype), None


def scatter_rows_auto(dy, idx, n, dtype):
    """Backend-dispatched row scatter-add: ``out[b, idx[b,q,j]] +=
    dy[b,q,j]`` — the Pallas VMEM-accumulator kernel on TPU f32, XLA's
    scatter elsewhere. Shared by the gather VJP and the fused stage
    tails' reference backward path."""
    import os

    b = dy.shape[0]
    c = dy.shape[-1]
    k = idx.shape[-1]
    acc_bytes = (n + 8) * c * 4
    use_pallas = (
        jax.default_backend() == "tpu"
        and dtype == jnp.float32
        and acc_bytes <= 8 * 2**20  # accumulator must fit VMEM
        and os.environ.get("DGCNN_SCATTER_IMPL", "pallas") == "pallas"
    )
    if use_pallas:
        from dgcnn_tpu.kernels.scatter_pallas import scatter_add_rows

        # rotate rows over as many accumulator copies as fit a ~16 MiB
        # VMEM budget (breaks the serial RMW chain: 8 copies measured the
        # in-step optimum — train step 98.2/93.5/85.1 ms at 2/4/8 copies);
        # env overrides are perf-experiment knobs (scripts/exp_*.py)
        chunk = int(os.environ.get("DGCNN_SCATTER_CHUNK", 2048))
        copies = max(int(os.environ.get("DGCNN_SCATTER_COPIES", 8)), 1)
        # the kernel requires copies | chunk: round down to the largest
        # power of two that divides chunk (scatter_add_rows would raise
        # mid-training on a bad env value otherwise)
        copies = 1 << (copies.bit_length() - 1)
        while copies > 1 and chunk % copies:
            copies //= 2
        acc_mb = float(os.environ.get("DGCNN_SCATTER_VMEM_MB", 16))
        while copies > 1 and copies * acc_bytes > acc_mb * 2**20:
            copies //= 2
        # rows per copy per loop step (kernel bookkeeping amortisation;
        # hazard distance unchanged) — same power-of-two sanitisation.
        # Default 4: in-step sweep measured 77.0 -> 74.4 ms at copies=8/
        # unroll=4 (copies=16 no better, 32 fails to compile;
        # scripts/exp_scatter_unroll.py, v5e)
        unroll = max(int(os.environ.get("DGCNN_SCATTER_UNROLL", 4)), 1)
        unroll = 1 << (unroll.bit_length() - 1)
        while unroll > 1 and chunk % (copies * unroll):
            unroll //= 2
        da = scatter_add_rows(
            dy.reshape(b, n * k, c), idx.reshape(b, n * k), n,
            copies=copies, chunk=chunk, unroll=unroll,
        )
    else:
        table = jnp.zeros((b * n, c), dtype)
        gidx = idx + (jnp.arange(b, dtype=idx.dtype) * n)[:, None, None]
        da = table.at[gidx.reshape(-1)].add(
            dy.reshape(-1, c).astype(dtype)
        ).reshape(b, n, c)
    return da.astype(dtype)


gather_neighbors.defvjp(_gather_fwd, _gather_bwd)


def edge_features(x: jax.Array, idx: jax.Array) -> jax.Array:
    """Explicit edge features ``cat([x_j - x_i, x_i])`` — parity helper.

    Mirrors /root/reference/model.py:43-83 output (up to layout): returns
    (B, N, k, 2C) channels-last instead of (B, 2C, N, k). The model itself
    uses the decomposed form (:func:`edge_conv_linear`); this exists for
    tests and for external consumers of the reference API.
    """
    nbr = gather_neighbors(x, idx)                 # (B, N, k, C)
    ctr = jnp.broadcast_to(x[:, :, None, :], nbr.shape)
    return jnp.concatenate([nbr - ctr, ctr], axis=-1)


def edge_conv_linear(
    x: jax.Array,
    idx: jax.Array,
    w: jax.Array,
    *,
    compute_dtype: jnp.dtype | None = None,
    gather_first: bool | None = None,
) -> jax.Array:
    """First EdgeConv 1×1 conv without materialising edge features.

    Computes ``edge_features(x, idx) @ w`` exactly (up to fp reassociation)
    via the linear decomposition documented in the module docstring.

    Args:
        x: (B, N, C) point features.
        idx: (B, N, k) neighbour indices.
        w: (2C, C_out) conv weight; rows [:C] act on the relative part
           (x_j - x_i), rows [C:] on the centre part x_i. This matches the
           channel order of the reference concat (/root/reference/model.py:81).
        compute_dtype: optional dtype for the two point matmuls (e.g.
           bfloat16); accumulation stays float32.
        gather_first: gather raw x THEN matmul (``gather(x)@W == gather(x@W)``
           row-for-row). When C < C_out this shrinks both the gathered
           tensor and — critically — the backward scatter-add from C_out to
           C columns (the train-step scatter is latency-bound in row width;
           stage 1 has C=F=4 vs C_out=64). Default: C < C_out.

    Returns:
        (B, N, k, C_out) pre-BN conv activations.
    """
    c = x.shape[-1]
    c_out = w.shape[-1]
    if gather_first is None:
        gather_first = c < c_out
    w_d, w_x = w[:c], w[c:]
    xm = x if compute_dtype is None else x.astype(compute_dtype)
    w_dm = w_d if compute_dtype is None else w_d.astype(compute_dtype)
    w_cm = (w_x - w_d) if compute_dtype is None else (w_x - w_d).astype(compute_dtype)
    b = jnp.einsum("bnc,cd->bnd", xm, w_cm, preferred_element_type=jnp.float32)
    if gather_first:
        nbr = gather_neighbors(xm, idx)                # (B, N, k, C)
        a_n = jnp.einsum("bnkc,cd->bnkd", nbr, w_dm,
                         preferred_element_type=jnp.float32)
        return a_n + b[:, :, None, :]
    a = jnp.einsum("bnc,cd->bnd", xm, w_dm, preferred_element_type=jnp.float32)
    return gather_neighbors(a, idx) + b[:, :, None, :]


def edge_conv_linear_extrema(
    x: jax.Array,
    idx: jax.Array,
    w: jax.Array,
    *,
    compute_dtype: jnp.dtype | None = None,
) -> tuple[jax.Array, jax.Array]:
    """Per-channel (max, min) over k of the decomposed EdgeConv conv output.

    For an EdgeConv stage that applies a *single* conv before the
    max-over-neighbours (stage 3 of the reference, /root/reference/
    model.py:161-163), the subsequent BatchNorm+LeakyReLU are per-channel
    monotone maps — increasing where the effective BN scale is >= 0,
    decreasing otherwise. The max over k can therefore be taken *before*
    BN+activation by keeping both the per-channel max and min of the conv
    output and selecting by the sign of the BN scale. This removes every
    (B,N,k,·) element-wise op from the stage; only the gather and two k
    reductions remain.

    Returns:
        (max_over_k, min_over_k), each (B, N, C_out).
    """
    c = x.shape[-1]
    w_d, w_x = w[:c], w[c:]
    xm = x if compute_dtype is None else x.astype(compute_dtype)
    w_dm = w_d if compute_dtype is None else w_d.astype(compute_dtype)
    w_cm = (w_x - w_d) if compute_dtype is None else (w_x - w_d).astype(compute_dtype)
    a = jnp.einsum("bnc,cd->bnd", xm, w_dm, preferred_element_type=jnp.float32)
    b = jnp.einsum("bnc,cd->bnd", xm, w_cm, preferred_element_type=jnp.float32)
    nbr = gather_neighbors(a, idx)                 # (B, N, k, C_out)
    return jnp.max(nbr, axis=2) + b, jnp.min(nbr, axis=2) + b


def bn_lrelu_max_train(
    e: jax.Array, gamma: jax.Array, beta: jax.Array
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Fused training-mode stage tail: ``max_k(lrelu(BN_train(e)))``.

    Forward is mathematically identical to one-pass ``_batch_norm`` +
    LeakyReLU(0.2) + :func:`max_over_k`; returns ``(out, batch_mean,
    batch_var_biased)`` so the caller updates running statistics.

    The win is the BACKWARD: the stock autodiff chain sweeps the
    (B, N, k, C) stage tensor several times (scatter the max cotangent,
    LReLU mask, two BN reduction sums, the final dx elementwise). Because
    the max routes the cotangent to ONE k-slot per (b, n, c), both BN sums
    collapse to (B, N, C)-sized reductions:

        dy      = 1{k = argmax} * g'             (g' = g * lrelu'(out))
        S1[c]   = sum dy        = sum_{b,n} g'
        S2[c]   = sum dy * xhat = sum_{b,n} g' * xhat_at_argmax

    with ``xhat_at_argmax`` recovered from ``out`` itself (lrelu and the
    BN affine are invertible per channel). The big tensor is then touched
    exactly twice — one read of ``e`` (for xhat), one write of ``de``:

        de = gamma * inv * (dy - (S1 + xhat * S2) / M)

    Torch-parity notes: first-argmax tie routing (matching
    :func:`max_over_k`); when a channel's gamma is EXACTLY 0, dgamma for
    that channel is returned as 0 instead of sum(dy*xhat) (xhat is
    unrecoverable from out) — unreachable from torch init in practice.
    """
    return _bn_lrelu_max(e, gamma, beta)


@jax.custom_vjp
def _bn_lrelu_max(e, gamma, beta):
    out, _ = _bn_lrelu_max_fwd(e, gamma, beta)
    return out


_BN_EPS = 1e-5
_LRELU_SLOPE = 0.2


def _bn_lrelu_max_core(e, gamma, beta):
    """Shared forward core of the fused max tails: one-pass batch stats,
    normalise, LReLU, first-max reduce. Single source of truth for the
    constants (eps, slope) and the stat/argmax math used by BOTH the
    stock (:func:`bn_lrelu_max_train`) and decomposed
    (:func:`edge_stage_tail_train`) tails — they must stay bit-identical."""
    axes = tuple(range(e.ndim - 1))
    mean = jnp.mean(e, axis=axes)
    var = jnp.maximum(
        jnp.mean(jnp.square(e), axis=axes) - jnp.square(mean), 0.0
    )
    inv = jax.lax.rsqrt(var + _BN_EPS)
    y = (e - mean) * (inv * gamma) + beta
    z = jnp.where(y >= 0, y, _LRELU_SLOPE * y)
    mx = jnp.max(z, axis=2)
    am = jnp.argmax(z, axis=2)          # first-max (lrelu is monotone)
    k = e.shape[2]
    am_dtype = jnp.int8 if k <= 127 else jnp.int32
    return mean, var, inv, mx, am.astype(am_dtype)


def _max_tail_sums(g, mx, gamma, beta):
    """Shared backward tables of the fused max tails: the LReLU-routed
    max cotangent ``gp`` and its channel sums ``s1``/``s2`` (= dbeta/
    dgamma), with xhat recovered from the max output (gamma==0 channels
    keep the documented dgamma=0 convention)."""
    gp = jnp.where(mx >= 0, g, _LRELU_SLOPE * g)           # (B, N, C)
    ystar = jnp.where(mx >= 0, mx, mx / _LRELU_SLOPE)
    safe = jnp.abs(gamma) > 0
    xstar = jnp.where(
        safe, (ystar - beta) / jnp.where(safe, gamma, 1.0), 0.0
    )
    s1 = jnp.sum(gp, axis=(0, 1))
    s2 = jnp.sum(gp * xstar, axis=(0, 1))
    return gp, s1, s2


def _bn_lrelu_max_fwd(e, gamma, beta):
    mean, var, inv, mx, am = _bn_lrelu_max_core(e, gamma, beta)
    res = (e, gamma, beta, mean, inv, am, mx)
    return (mx, mean, var), res


def _bn_lrelu_max_bwd(res, cot):
    g = cot[0]                          # mean/var outputs carry no loss
    e, gamma, beta, mean, inv, am, mx = res
    k = e.shape[2]
    m_count = e.size // e.shape[-1]
    gp, s1, s2 = _max_tail_sums(g, mx, gamma, beta)
    k_iota = jax.lax.broadcasted_iota(jnp.int32, (1, 1, k, 1), 2)
    dy = jnp.where(
        k_iota == am[:, :, None, :].astype(jnp.int32),
        gp[:, :, None, :],
        0.0,
    )
    xhat = (e - mean) * inv
    de = (gamma * inv) * (dy - (s1 + xhat * s2) * (1.0 / m_count))
    return de, s2, s1


_bn_lrelu_max.defvjp(_bn_lrelu_max_fwd, _bn_lrelu_max_bwd)


def edge_stage_tail_train(
    a: jax.Array,
    bvec: jax.Array,
    idx: jax.Array,
    gamma: jax.Array,
    beta: jax.Array,
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Fused single-conv EdgeConv stage tail (training):
    ``max_k(lrelu(BN_train(gather(a, idx) + bvec)))``.

    Forward is bit-identical to ``gather_neighbors`` + broadcast-add +
    :func:`bn_lrelu_max_train` (same op order); the win is the BACKWARD:
    because the stage's pre-BN tensor is ``e[q, j] = a[idx[q, j]] +
    bvec[q]``, the BN+LReLU+max cotangent decomposes into q-indexed
    tables plus a count-factorised a-term —

        de[q,j] = u[q] * 1{am[q] == j} + w[q] + corr[a[idx[q,j]]]

    (u = gamma*inv*gp from the max routing, w the per-query dense BN
    correction, corr linear in the TARGET row) — so the backward scatter
    runs as :func:`dgcnn_tpu.kernels.scatter_pallas.scatter_stage_tail_rows`
    with the (B, N, k, C) cotangent never materialised in HBM, the hit
    COUNT accumulated in a reserved lane of the same RMW, and ``e``
    dropped from the residuals (the only (B, N, k, C) residual of the
    stock pair). ``sum_j de`` (the bvec cotangent) comes from the
    forward's extra per-query sum ``S_e`` — one more accumulator fused
    into the existing BN-stat sweep.

    Returns ``(max_out, batch_mean, batch_var_biased)`` like
    :func:`bn_lrelu_max_train`. Torch-parity notes there apply, except
    xhat is recovered from ``a``/``bvec`` directly, so the gamma==0
    caveat affects only dgamma (kept 0 for parity), not ``de``.
    Reference stage: /root/reference/model.py:161-163 (conv5 + max).
    """
    return _edge_stage_tail(a, bvec, idx, gamma, beta)


@jax.custom_vjp
def _edge_stage_tail(a, bvec, idx, gamma, beta):
    out, _ = _edge_stage_tail_fwd(a, bvec, idx, gamma, beta)
    return out


def _edge_stage_tail_fwd(a, bvec, idx, gamma, beta):
    e = _gather_impl(a, idx) + bvec[:, :, None, :]
    mean, var, inv, mx, am = _bn_lrelu_max_core(e, gamma, beta)
    se = jnp.sum(e, axis=2)             # (B, N, C): the bvec-cot sweep
    res = (a, bvec, idx, gamma, beta, mean, inv, am, mx, se)
    return (mx, mean, var), res


def _edge_stage_tail_bwd(res, cot):
    import os

    g = cot[0]                          # mean/var outputs carry no loss
    a, bvec, idx, gamma, beta, mean, inv, am, mx, se = res
    b, n, c = a.shape
    k = idx.shape[-1]
    m_count = b * n * k
    gp, s1, s2 = _max_tail_sums(g, mx, gamma, beta)
    gi = gamma * inv
    u = gi * gp                                            # (B, N, C)
    w = -(gi / m_count) * (s1 + (bvec - mean) * inv * s2)  # (B, N, C)
    corr = -(gi * s2 * inv / m_count) * a                  # (B, N, C)
    backend = jax.default_backend()
    impl = os.environ.get(
        "DGCNN_STAGE_TAIL_SCATTER",
        "kernel" if backend == "tpu" and a.dtype == jnp.float32
        else "xla",
    )
    l_pad = -(-(c + 1) // 128) * 128
    # total VMEM accumulator footprint (out block + rotation copies) must
    # fit the kernel's scoped budget; clamp copies, and fall back to the
    # XLA path entirely when even one accumulator is too big (mirrors
    # scatter_rows_auto's guard — large-N configs must degrade, not
    # fail to compile)
    acc_bytes = (-(-(n + 1) // 8) * 8) * l_pad * 4
    budget = int(os.environ.get("DGCNN_STAGE_TAIL_VMEM_MB", 48)) * 2**20
    copies = max(int(os.environ.get("DGCNN_SCATTER_COPIES", 8)), 1)
    while copies > 1 and copies * acc_bytes > budget:
        copies //= 2
    if impl == "kernel" and acc_bytes > budget:
        impl = "xla"
    if impl in ("kernel", "interpret"):
        from dgcnn_tpu.kernels.scatter_pallas import scatter_stage_tail_rows

        zpad = jnp.zeros((b, n, l_pad - c), u.dtype)
        u_p = jnp.concatenate([u, zpad], -1)
        w_p = jnp.concatenate(
            [w, jnp.ones((b, n, 1), w.dtype),
             jnp.zeros((b, n, l_pad - c - 1), w.dtype)], -1)
        am_p = jnp.concatenate(
            [am.astype(jnp.int32),
             jnp.full((b, n, l_pad - c), -1, jnp.int32)], -1)
        scat = scatter_stage_tail_rows(
            u_p, w_p, am_p, idx, k=k, n=n, copies=copies,
            interpret=impl == "interpret",
        )
        count = scat[..., c]
        da = scat[..., :c] + count[..., None] * corr
    else:
        # reference path (CPU / non-f32 / A-B baseline): materialise de
        # and run the stock scatter (Pallas scatter_add_rows on TPU f32)
        k_iota = jax.lax.broadcasted_iota(jnp.int32, (1, 1, k, 1), 2)
        mask = k_iota == am[:, :, None, :].astype(jnp.int32)
        de = (
            jnp.where(mask, u[:, :, None, :], 0.0)
            + w[:, :, None, :]
            + _gather_impl(corr, idx)
        )
        da = scatter_rows_auto(de, idx, n, a.dtype)
    d_bvec = gi * (gp - (k * s1 + (se - k * mean) * inv * s2)
                   * (1.0 / m_count))
    return da, d_bvec, None, s2, s1


_edge_stage_tail.defvjp(_edge_stage_tail_fwd, _edge_stage_tail_bwd)


def bn_lrelu_train(
    e: jax.Array, gamma: jax.Array, beta: jax.Array
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Fused training-mode mid-stage ``lrelu(BN_train(e))`` (no max).

    Same math as one-pass ``_batch_norm`` + LeakyReLU(0.2); the custom
    backward keeps only ``e`` as the big residual (stock autodiff also
    materialises the normalised tensor and the activation mask) and
    recomputes xhat/sign inside the two backward sweeps."""
    return _bn_lrelu(e, gamma, beta)


@jax.custom_vjp
def _bn_lrelu(e, gamma, beta):
    return _bn_lrelu_fwd(e, gamma, beta)[0]


def _bn_lrelu_fwd(e, gamma, beta):
    eps = 1e-5
    slope = 0.2
    axes = tuple(range(e.ndim - 1))
    mean = jnp.mean(e, axis=axes)
    var = jnp.maximum(
        jnp.mean(jnp.square(e), axis=axes) - jnp.square(mean), 0.0
    )
    inv = jax.lax.rsqrt(var + eps)
    y = (e - mean) * (inv * gamma) + beta
    z = jnp.where(y >= 0, y, slope * y)
    return (z, mean, var), (e, gamma, beta, mean, inv)


def _bn_lrelu_bwd(res, cot):
    g = cot[0]
    e, gamma, beta, mean, inv = res
    slope = 0.2
    axes = tuple(range(e.ndim - 1))
    m_count = e.size // e.shape[-1]
    xhat = (e - mean) * inv
    y = xhat * gamma + beta
    gp = jnp.where(y >= 0, g, slope * g)
    s1 = jnp.sum(gp, axis=axes)
    s2 = jnp.sum(gp * xhat, axis=axes)
    de = (gamma * inv) * (gp - (s1 + xhat * s2) * (1.0 / m_count))
    return de, s2, s1


_bn_lrelu.defvjp(_bn_lrelu_fwd, _bn_lrelu_bwd)


def max_over_k(e: jax.Array) -> jax.Array:
    """``jnp.max(e, axis=2)`` with a torch-matching backward.

    JAX's reduce-max VJP splits the cotangent equally among tied maxima
    and keeps the full (B,N,k,C) operand as a backward residual. torch
    routes the gradient to the FIRST argmax only
    (/root/reference/model.py:130 ``.max(dim=-1)`` backward) — this VJP
    reproduces that semantics exactly, and its residual is the int8
    argmax (B,N,C): ~170x smaller than the stage tensor. Step latency is
    neutral on v5e (87-91 ms A/B, inside run noise); the wins are parity
    and backward memory.
    """
    return _max_over_k(e)


@jax.custom_vjp
def _max_over_k(e):
    return jnp.max(e, axis=2)


def _max_fwd(e):
    # max and argmax reduce over the same axis of the same operand — XLA
    # fuses them into one sweep of the (B,N,k,C) tensor
    mx = jnp.max(e, axis=2)
    am = jnp.argmax(e, axis=2)                     # (B, N, C), first-max
    # int8 residual only while every k-slot index fits; beyond that the
    # wrap would silently misroute gradients
    k = e.shape[2]
    am_dtype = jnp.int8 if k <= 127 else jnp.int32
    return mx, (am.astype(am_dtype), k)


def _max_bwd(res, g):
    am, k = res
    k_iota = jax.lax.broadcasted_iota(jnp.int32, (1, 1, k, 1), 2)
    de = jnp.where(
        k_iota == am[:, :, None, :].astype(jnp.int32),
        g[:, :, None, :],
        0.0,
    )
    return (de,)


_max_over_k.defvjp(_max_fwd, _max_bwd)
