"""EdgeConv op tests: gather correctness and exactness of the linear
decomposition vs the explicit edge-feature formulation
(/root/reference/model.py:43-83)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dgcnn_tpu.ops.edgeconv import (
    edge_conv_linear,
    edge_conv_linear_extrema,
    edge_features,
    gather_neighbors,
)


def test_gather_neighbors_golden():
    feats = jnp.asarray(np.arange(2 * 4 * 3, dtype=np.float32).reshape(2, 4, 3))
    idx = jnp.asarray([[[0, 1], [2, 0], [3, 3], [1, 2]],
                       [[3, 2], [0, 0], [1, 3], [2, 1]]], dtype=jnp.int32)
    got = np.asarray(gather_neighbors(feats, idx))
    want = np.stack(
        [np.asarray(feats)[b][np.asarray(idx)[b]] for b in range(2)]
    )
    np.testing.assert_array_equal(got, want)


def test_edge_features_structure(rng):
    x = jnp.asarray(rng.standard_normal((2, 16, 5)).astype(np.float32))
    idx = jnp.asarray(rng.integers(0, 16, (2, 16, 4)), dtype=jnp.int32)
    ef = np.asarray(edge_features(x, idx))
    assert ef.shape == (2, 16, 4, 10)
    xn = np.asarray(x)
    # first half: x_j - x_i ; second half: x_i
    for b in (0, 1):
        for i in (0, 7, 15):
            for jj in range(4):
                j = int(np.asarray(idx)[b, i, jj])
                np.testing.assert_allclose(
                    ef[b, i, jj, :5], xn[b, j] - xn[b, i], atol=1e-6
                )
                np.testing.assert_allclose(ef[b, i, jj, 5:], xn[b, i], atol=1e-6)


def test_edge_conv_linear_matches_explicit(rng):
    x = jnp.asarray(rng.standard_normal((2, 32, 6)).astype(np.float32))
    idx = jnp.asarray(rng.integers(0, 32, (2, 32, 5)), dtype=jnp.int32)
    w = jnp.asarray(rng.standard_normal((12, 8)).astype(np.float32))
    explicit = jnp.einsum("bnkc,cd->bnkd", edge_features(x, idx), w)
    fused = edge_conv_linear(x, idx, w)
    np.testing.assert_allclose(
        np.asarray(fused), np.asarray(explicit), atol=1e-4, rtol=1e-4
    )


def test_edge_conv_linear_extrema(rng):
    x = jnp.asarray(rng.standard_normal((1, 24, 4)).astype(np.float32))
    idx = jnp.asarray(rng.integers(0, 24, (1, 24, 6)), dtype=jnp.int32)
    w = jnp.asarray(rng.standard_normal((8, 10)).astype(np.float32))
    full = np.asarray(jnp.einsum("bnkc,cd->bnkd", edge_features(x, idx), w))
    mx, mn = edge_conv_linear_extrema(x, idx, w)
    np.testing.assert_allclose(np.asarray(mx), full.max(axis=2), atol=1e-4)
    np.testing.assert_allclose(np.asarray(mn), full.min(axis=2), atol=1e-4)


def test_gather_custom_vjp_matches_xla_scatter(rng):
    """gather_neighbors' custom VJP (Pallas scatter on TPU, XLA elsewhere)
    must equal the autodiff-of-gather scatter everywhere."""
    feats = jnp.asarray(rng.standard_normal((2, 40, 16)), jnp.float32)
    idx = jnp.asarray(rng.integers(0, 40, (2, 40, 6)), jnp.int32)
    dy = jnp.asarray(rng.standard_normal((2, 40, 6, 16)), jnp.float32)

    _, vjp = jax.vjp(lambda f: gather_neighbors(f, idx), feats)
    got = vjp(dy)[0]

    def ref_gather(f):
        b, n, c = f.shape
        table = f.reshape(b * n, c)
        g = idx + (jnp.arange(b, dtype=idx.dtype) * n)[:, None, None]
        return table[g.reshape(-1)].reshape(b, n, 6, c)

    _, vjp_ref = jax.vjp(ref_gather, feats)
    want = vjp_ref(dy)[0]
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-5, rtol=1e-5)


def test_scatter_pallas_kernel_interpret(rng):
    """The Pallas scatter kernel itself (interpret mode on CPU) matches the
    XLA scatter, including the padded-chunk dump row."""
    from dgcnn_tpu.kernels.scatter_pallas import scatter_add_rows

    b, m, c, n = 2, 500, 16, 40  # m deliberately not a chunk multiple
    dy = jnp.asarray(rng.standard_normal((b, m, c)), jnp.float32)
    idx = jnp.asarray(rng.integers(0, n, (b, m)), jnp.int32)
    got = scatter_add_rows(dy, idx, n, chunk=128, interpret=True)
    want = jnp.zeros((b, n, c)).at[jnp.arange(b)[:, None], idx].add(dy)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-5, rtol=1e-5)


@pytest.mark.parametrize("copies,unroll", [(2, 1), (4, 1), (2, 4), (4, 2)])
def test_scatter_pallas_copies_variants(copies, unroll, rng):
    """The accumulator-copies and per-copy unroll knobs (rotating rows
    across independent VMEM accumulators to break the serial RMW chain;
    unroll amortises loop bookkeeping) must be pure perf knobs: results
    equal the single-accumulator kernel up to f32 sum order."""
    from dgcnn_tpu.kernels.scatter_pallas import scatter_add_rows

    b, m, c, n = 2, 500, 16, 40
    dy = jnp.asarray(rng.standard_normal((b, m, c)), jnp.float32)
    idx = jnp.asarray(rng.integers(0, n, (b, m)), jnp.int32)
    got = scatter_add_rows(dy, idx, n, chunk=128, copies=copies,
                           unroll=unroll, interpret=True)
    want = jnp.zeros((b, n, c)).at[jnp.arange(b)[:, None], idx].add(dy)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-5, rtol=1e-5)


def test_scatter_env_knob_sanitisation(rng, monkeypatch):
    """DGCNN_SCATTER_UNROLL / _COPIES values that aren't powers of two (or
    don't divide the chunk) must be sanitised at the knob, not raise
    inside the backward pass mid-training. Forces the TPU branch of
    _gather_bwd on CPU via a spied interpret-mode kernel."""
    import dgcnn_tpu.kernels.scatter_pallas as sp
    from dgcnn_tpu.ops.edgeconv import gather_neighbors

    calls = {}
    orig = sp.scatter_add_rows

    def spy(dy, idx, n, **kw):
        calls.update(kw)
        kw["interpret"] = True
        return orig(dy, idx, n, **kw)

    monkeypatch.setattr(sp, "scatter_add_rows", spy)
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    monkeypatch.setenv("DGCNN_SCATTER_COPIES", "3")   # not a pow2
    monkeypatch.setenv("DGCNN_SCATTER_UNROLL", "48")  # not a pow2, big
    b, n, k, c = 2, 64, 4, 8
    x = jnp.asarray(rng.standard_normal((b, n, c)), jnp.float32)
    idx = jnp.asarray(rng.integers(0, n, (b, n, k)), jnp.int32)

    def loss(x_):
        return jnp.sum(gather_neighbors(x_, idx) ** 2)

    g = jax.grad(loss)(x)
    assert calls["copies"] == 2, calls             # 3 → pow2 clamp
    chunk = calls["chunk"]
    assert chunk % (calls["copies"] * calls["unroll"]) == 0, calls
    want = jax.grad(
        lambda x_: jnp.sum(
            jnp.take_along_axis(
                x_[:, :, None, :], idx[..., None], axis=1) ** 2)
    )(x)
    np.testing.assert_allclose(np.asarray(g), np.asarray(want),
                               atol=1e-5, rtol=1e-5)


def test_max_over_k_forward_and_grad(rng):
    """max_over_k == jnp.max forward; backward routes the cotangent to the
    FIRST argmax only (torch max-backward semantics,
    /root/reference/model.py:130) — identical to JAX's split-among-ties
    VJP whenever maxima are unique."""
    from dgcnn_tpu.ops.edgeconv import max_over_k

    e = jnp.asarray(rng.standard_normal((2, 5, 7, 3)), jnp.float32)
    np.testing.assert_array_equal(
        np.asarray(max_over_k(e)), np.asarray(jnp.max(e, axis=2)))

    g_custom = jax.grad(lambda t: jnp.sum(max_over_k(t) ** 2))(e)
    g_ref = jax.grad(lambda t: jnp.sum(jnp.max(t, axis=2) ** 2))(e)
    np.testing.assert_allclose(np.asarray(g_custom), np.asarray(g_ref),
                               atol=1e-6)

    # tie case: gradient goes to the first maximum only
    t = jnp.zeros((1, 1, 4, 1), jnp.float32)
    g = jax.grad(lambda v: jnp.sum(max_over_k(v)))(t)
    np.testing.assert_array_equal(
        np.asarray(g)[0, 0, :, 0], np.float32([1, 0, 0, 0]))


def test_max_over_k_wide_k_grad(rng):
    """k > 127 must widen the argmax residual past int8 (a wrapped index
    would silently route gradients to wrong k-slots)."""
    import jax
    import jax.numpy as jnp

    from dgcnn_tpu.ops.edgeconv import max_over_k

    e = jnp.asarray(rng.normal(size=(1, 3, 200, 2)).astype("float32"))
    g = jax.grad(lambda t: jnp.sum(max_over_k(t) * 2.0))(e)
    want = jax.grad(lambda t: jnp.sum(jnp.max(t, axis=2) * 2.0))(e)
    # tie-free random data: first-argmax == split-gradient semantics
    assert jnp.allclose(g, want)


def test_gather_rows_pallas_interpret(rng):
    import jax.numpy as jnp
    import numpy as np

    from dgcnn_tpu.kernels.gather_pallas import gather_rows

    table = jnp.asarray(rng.normal(size=(3, 37, 8)).astype("float32"))
    idx = jnp.asarray(rng.integers(0, 37, (3, 101)).astype("int32"))
    got = np.asarray(gather_rows(table, idx, chunk=32, unroll=8,
                                 interpret=True))
    want = np.stack([np.asarray(table)[b][np.asarray(idx)[b]]
                     for b in range(3)])
    np.testing.assert_array_equal(got, want)


def test_bn_lrelu_max_train_forward_and_grad_parity(rng):
    """The fused stage tail must match the decomposed one-pass
    BN->LReLU->max chain in value AND gradients (e, gamma, beta) on
    tie-free data."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from dgcnn_tpu.ops.edgeconv import bn_lrelu_max_train

    e = jnp.asarray(rng.normal(size=(2, 17, 9, 6)).astype("float32")) * 2.0
    gamma = jnp.asarray(rng.normal(size=(6,)).astype("float32")) + 0.5
    beta = jnp.asarray(rng.normal(size=(6,)).astype("float32"))

    def ref(e, gamma, beta):
        axes = (0, 1, 2)
        mean = jnp.mean(e, axis=axes)
        var = jnp.maximum(
            jnp.mean(jnp.square(e), axis=axes) - jnp.square(mean), 0.0)
        inv = jax.lax.rsqrt(var + 1e-5)
        y = (e - mean) * (inv * gamma) + beta
        z = jnp.where(y >= 0, y, 0.2 * y)
        return jnp.max(z, axis=2), mean, var

    want_out, want_mean, want_var = ref(e, gamma, beta)
    got_out, got_mean, got_var = bn_lrelu_max_train(e, gamma, beta)
    np.testing.assert_allclose(got_out, want_out, atol=1e-6)
    np.testing.assert_allclose(got_mean, want_mean, atol=1e-6)
    np.testing.assert_allclose(got_var, want_var, atol=1e-6)

    w = jnp.asarray(rng.normal(size=want_out.shape).astype("float32"))

    def loss_ref(e, gamma, beta):
        return jnp.sum(ref(e, gamma, beta)[0] * w)

    def loss_fused(e, gamma, beta):
        return jnp.sum(bn_lrelu_max_train(e, gamma, beta)[0] * w)

    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(e, gamma, beta)
    g_fused = jax.grad(loss_fused, argnums=(0, 1, 2))(e, gamma, beta)
    for a, b, name in zip(g_fused, g_ref, ("de", "dgamma", "dbeta")):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=2e-5, rtol=1e-4,
            err_msg=name)


def test_bn_lrelu_max_negative_gamma_and_wide_k(rng):
    """Negative gamma (lrelu inversion + xhat recovery through a negative
    affine) and k > 127 (int32 argmax residual) both stay grad-exact."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from dgcnn_tpu.ops.edgeconv import bn_lrelu_max_train

    e = jnp.asarray(rng.normal(size=(1, 5, 140, 3)).astype("float32"))
    gamma = jnp.asarray([-1.2, 0.7, -0.3], jnp.float32)
    beta = jnp.asarray([0.1, -0.4, 0.0], jnp.float32)

    def ref(e):
        axes = (0, 1, 2)
        mean = jnp.mean(e, axis=axes)
        var = jnp.maximum(
            jnp.mean(jnp.square(e), axis=axes) - jnp.square(mean), 0.0)
        inv = jax.lax.rsqrt(var + 1e-5)
        y = (e - mean) * (inv * gamma) + beta
        z = jnp.where(y >= 0, y, 0.2 * y)
        return jnp.sum(jnp.max(z, axis=2) ** 2)

    got = jax.grad(lambda t: jnp.sum(
        bn_lrelu_max_train(t, gamma, beta)[0] ** 2))(e)
    want = jax.grad(ref)(e)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-5, rtol=1e-4)


def test_train_step_fused_tail_matches_plain(rng):
    """One full train step with stage_tail_fused on/off: identical loss
    and near-identical parameter updates (same math, different backward
    association)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from dgcnn_tpu.models.dgcnn import DGCNNConfig
    from dgcnn_tpu.train.steps import (
        init_train_state, make_optimizer, make_train_step,
    )

    base = dict(num_classes=4, num_features=3, k=6, emb_dims=32,
                dropout=0.0, knn_query_chunk=None)
    pts = jnp.asarray(rng.normal(size=(2, 40, 3)).astype("float32"))
    labels = jnp.asarray(rng.integers(0, 4, (2, 40)).astype("int32"))
    mask = jnp.ones((2, 40), jnp.float32)

    outs = {}
    for fused in (True, False):
        cfg = DGCNNConfig(stage_tail_fused=fused, **base)
        tx = make_optimizer(use_sgd=True, lr=1e-4, epochs=2,
                            steps_per_epoch=1)
        st = init_train_state(jax.random.key(0), cfg, tx)
        st, m = make_train_step(cfg, tx, donate=False)(st, pts, labels, mask)
        outs[fused] = (float(m["loss"]), st)
    assert abs(outs[True][0] - outs[False][0]) < 1e-6
    for a, b in zip(jax.tree_util.tree_leaves(outs[True][1].params),
                    jax.tree_util.tree_leaves(outs[False][1].params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-6, rtol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(outs[True][1].bn_state),
                    jax.tree_util.tree_leaves(outs[False][1].bn_state)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-6, rtol=1e-5)


def test_fused_stage_kernels_odd_shapes(rng):
    """Direct kernel tests at awkward shapes: N not divisible by qt, odd k
    (qt*k unroll fallback), C2 != C — interpret mode."""
    import jax.numpy as jnp
    import numpy as np

    from dgcnn_tpu.kernels.edgeconv_pallas import (
        edgeconv_fused_extrema,
        edgeconv_fused_stage,
    )

    B, N, K, C, C2 = 2, 130, 7, 8, 16
    table = jnp.asarray(rng.normal(size=(B, N, C)).astype("float32"))
    idx = jnp.asarray(rng.integers(0, N, (B, N, K)).astype("int32"))
    bvec = jnp.asarray(rng.normal(size=(B, N, C)).astype("float32"))
    w2 = jnp.asarray(rng.normal(size=(C, C2)).astype("float32"))
    sa = jnp.asarray(rng.normal(size=(C,)).astype("float32"))
    ta = jnp.asarray(rng.normal(size=(C,)).astype("float32"))
    sb = jnp.asarray(rng.normal(size=(C2,)).astype("float32"))
    tb = jnp.asarray(rng.normal(size=(C2,)).astype("float32"))

    def ref_stage():
        g = np.stack([np.asarray(table)[b][np.asarray(idx)[b].reshape(-1)]
                      .reshape(N, K, C) for b in range(B)])
        e = g + np.asarray(bvec)[:, :, None, :]
        e = e * np.asarray(sa) + np.asarray(ta)
        e = np.where(e >= 0, e, 0.2 * e)
        h = e @ np.asarray(w2)
        h = h * np.asarray(sb) + np.asarray(tb)
        h = np.where(h >= 0, h, 0.2 * h)
        return h.max(axis=2)

    got = np.asarray(edgeconv_fused_stage(
        table, idx, bvec, w2, sa, ta, sb, tb, qt=64, interpret=True))
    np.testing.assert_allclose(got, ref_stage(), atol=1e-4, rtol=1e-4)

    gamma = jnp.asarray([-1.0, 0.5, 1.0, -0.2, 0.3, 2.0, -3.0, 0.1],
                        jnp.float32)
    got_x = np.asarray(edgeconv_fused_extrema(
        table, idx, bvec, gamma, sa, ta, qt=64, interpret=True))
    g = np.stack([np.asarray(table)[b][np.asarray(idx)[b].reshape(-1)]
                  .reshape(N, K, C) for b in range(B)])
    mx = g.max(axis=2) + np.asarray(bvec)
    mn = g.min(axis=2) + np.asarray(bvec)
    sel = np.where(np.asarray(gamma) >= 0, mx, mn)
    y = sel * np.asarray(sa) + np.asarray(ta)
    want_x = np.where(y >= 0, y, 0.2 * y)
    np.testing.assert_allclose(got_x, want_x, atol=1e-5, rtol=1e-5)


def test_fused_stage_bf16_matches_xla_chain(rng):
    """compute_dtype='bfloat16' must keep the fused eval path (round-3's
    blanket gate made bf16 eval SLOWER than f32); the bf16_mm kernel flag
    must reproduce the XLA chain's cast-then-matmul semantics."""
    import dataclasses

    import jax

    from dgcnn_tpu.models.dgcnn import DGCNNConfig, apply_dgcnn, init_dgcnn

    cfg = DGCNNConfig(num_classes=3, num_features=4, k=6, emb_dims=64,
                      compute_dtype="bfloat16", fuse_epilogue=True,
                      knn_impl="xla", knn_query_chunk=None)
    params, state = init_dgcnn(jax.random.key(0), cfg)
    x = jnp.asarray(rng.normal(size=(2, 200, 4)).astype("float32"))
    l_fused, _ = apply_dgcnn(params, state, x, cfg, train=False)
    cfg_off = dataclasses.replace(cfg, fuse_epilogue=False)
    l_xla, _ = apply_dgcnn(params, state, x, cfg_off, train=False)
    np.testing.assert_allclose(np.asarray(l_fused), np.asarray(l_xla),
                               atol=1e-5, rtol=1e-5)
    # and the auto gate resolves ON for bf16 on TPU (the fix under test):
    # we can't flip backends here, so check the property's logic directly
    assert dataclasses.replace(cfg, fuse_epilogue="auto")._fuse_on == (
        jax.default_backend() == "tpu")
