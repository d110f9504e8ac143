"""Fused single-conv stage tail (edge_stage_tail_train) parity tests.

The fused tail must be bit-identical to the stock composition
``gather_neighbors + broadcast-add + bn_lrelu_max_train`` in the forward
and grad-equal (up to f32 sum order) in the backward, on BOTH backward
implementations (the in-kernel-cotangent Pallas scatter in interpret
mode, and the XLA reference path). Reference stage:
/root/reference/model.py:161-163 (conv5 + neighbour max).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from dgcnn_tpu.kernels.scatter_pallas import scatter_stage_tail_rows
from dgcnn_tpu.ops.edgeconv import (
    bn_lrelu_max_train,
    edge_stage_tail_train,
    gather_neighbors,
)

B, N, K, C = 2, 67, 5, 7


def _rand(rng, *shape):
    return jnp.asarray(rng.normal(size=shape).astype(np.float32))


def _inputs(seed=0):
    rng = np.random.default_rng(seed)
    a = _rand(rng, B, N, C)
    bvec = _rand(rng, B, N, C)
    idx = jnp.asarray(rng.integers(0, N, (B, N, K)).astype(np.int32))
    gamma = _rand(rng, C) + 1.5
    beta = _rand(rng, C) * 0.1
    return a, bvec, idx, gamma, beta


def _stock(a, bvec, idx, gamma, beta):
    e = gather_neighbors(a, idx) + bvec[:, :, None, :]
    return bn_lrelu_max_train(e, gamma, beta)


def test_kernel_scatter_stage_tail_rows_matches_numpy():
    # k=7 with copies=3: the j % ncopies rotation is UNEVEN (3/3/1),
    # and q_block=8 does not divide n=37 (padding path)
    rng = np.random.default_rng(3)
    l = 128
    n, k = 37, 7
    u = rng.normal(size=(2, n, l)).astype(np.float32)
    w = rng.normal(size=(2, n, l)).astype(np.float32)
    am = rng.integers(-1, k, (2, n, l)).astype(np.int32)
    idx = rng.integers(0, n, (2, n, k)).astype(np.int32)
    out = np.asarray(scatter_stage_tail_rows(
        jnp.asarray(u), jnp.asarray(w), jnp.asarray(am), jnp.asarray(idx),
        k=k, n=n, q_block=8, interpret=True, copies=3,
    ))
    want = np.zeros((2, n, l), np.float32)
    for b in range(2):
        for q in range(n):
            for j in range(k):
                want[b, idx[b, q, j]] += u[b, q] * (am[b, q] == j) + w[b, q]
    np.testing.assert_allclose(out, want, rtol=1e-5, atol=1e-5)


def test_forward_bit_identical_to_stock():
    args = _inputs()
    got = edge_stage_tail_train(*args)
    want = _stock(*args)
    for g, w_ in zip(got, want):
        np.testing.assert_array_equal(np.asarray(g), np.asarray(w_))


@pytest.mark.parametrize("impl", ["interpret", "xla"])
def test_backward_matches_stock_autodiff(impl, monkeypatch):
    monkeypatch.setenv("DGCNN_STAGE_TAIL_SCATTER", impl)
    a, bvec, idx, gamma, beta = _inputs(1)
    rng = np.random.default_rng(9)
    gw = _rand(rng, B, N, C)  # non-uniform cotangent

    def loss_fused(a, bvec, gamma, beta):
        mx, _, _ = edge_stage_tail_train(a, bvec, idx, gamma, beta)
        return jnp.sum(mx * gw)

    def loss_stock(a, bvec, gamma, beta):
        mx, _, _ = _stock(a, bvec, idx, gamma, beta)
        return jnp.sum(mx * gw)

    g_f = jax.grad(loss_fused, argnums=(0, 1, 2, 3))(a, bvec, gamma, beta)
    g_s = jax.grad(loss_stock, argnums=(0, 1, 2, 3))(a, bvec, gamma, beta)
    for gf, gs, name in zip(g_f, g_s, ("a", "bvec", "gamma", "beta")):
        np.testing.assert_allclose(
            np.asarray(gf), np.asarray(gs), rtol=2e-5, atol=2e-5,
            err_msg=f"d{name} mismatch ({impl})")


def test_backward_kernel_k_over_copies(monkeypatch):
    # copies=3 with k=5: the j % ncopies rotation is UNEVEN (2/2/1)
    # through the custom-VJP path, and q_block does not divide N
    a, bvec, idx, gamma, beta = _inputs(2)

    def loss(a):
        mx, _, _ = edge_stage_tail_train(a, bvec, idx, gamma, beta)
        return jnp.sum(mx)

    monkeypatch.setenv("DGCNN_STAGE_TAIL_SCATTER", "interpret")
    monkeypatch.setenv("DGCNN_SCATTER_COPIES", "3")
    g_k = jax.grad(loss)(a)
    monkeypatch.setenv("DGCNN_STAGE_TAIL_SCATTER", "xla")
    g_x = jax.grad(loss)(a)
    np.testing.assert_allclose(np.asarray(g_k), np.asarray(g_x),
                               rtol=2e-5, atol=2e-5)


def test_gamma_zero_channel_de_exact():
    # gamma == 0 channels: the stock tail documents dgamma=0 (xhat is
    # unrecoverable from out); the fused tail recovers xhat from a/bvec,
    # so de must STILL match stock autodiff... stock's de also uses
    # e-derived xhat, so both are exact; dgamma keeps the 0 convention.
    a, bvec, idx, gamma, beta = _inputs(4)
    gamma = gamma.at[2].set(0.0)

    def loss_fused(a, gamma):
        mx, _, _ = edge_stage_tail_train(a, bvec, idx, gamma, beta)
        return jnp.sum(mx)

    def loss_stock(a, gamma):
        mx, _, _ = _stock(a, bvec, idx, gamma, beta)
        return jnp.sum(mx)

    gf_a, gf_g = jax.grad(loss_fused, argnums=(0, 1))(a, gamma)
    gs_a, gs_g = jax.grad(loss_stock, argnums=(0, 1))(a, gamma)
    np.testing.assert_allclose(np.asarray(gf_a), np.asarray(gs_a),
                               rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(np.asarray(gf_g), np.asarray(gs_g),
                               rtol=2e-5, atol=2e-5)


def test_full_train_step_kernel_backward(monkeypatch):
    """The in-kernel-cotangent backward (interpret mode) through the FULL
    model train step: loss identical and parameter updates equal to the
    XLA stage-tail backward within f32 sum-order tolerance."""
    from dgcnn_tpu.models.dgcnn import DGCNNConfig
    from dgcnn_tpu.train.steps import (
        init_train_state, make_optimizer, make_train_step,
    )

    rng = np.random.default_rng(11)
    base = dict(num_classes=4, num_features=3, k=6, emb_dims=32,
                dropout=0.0, knn_query_chunk=None)
    pts = jnp.asarray(rng.normal(size=(2, 40, 3)).astype("float32"))
    labels = jnp.asarray(rng.integers(0, 4, (2, 40)).astype("int32"))
    mask = jnp.ones((2, 40), jnp.float32)

    outs = {}
    for i, impl in enumerate(("interpret", "xla")):
        monkeypatch.setenv("DGCNN_STAGE_TAIL_SCATTER", impl)
        # knn_query_chunk nudge -> fresh trace so the env var is re-read
        cfg = DGCNNConfig(**{**base, "knn_query_chunk": 4096 + i})
        tx = make_optimizer(use_sgd=True, lr=1e-4, epochs=2,
                            steps_per_epoch=1)
        st = init_train_state(jax.random.key(0), cfg, tx)
        st, m = make_train_step(cfg, tx, donate=False)(st, pts, labels,
                                                       mask)
        outs[impl] = (float(m["loss"]), st)
    assert abs(outs["interpret"][0] - outs["xla"][0]) < 1e-6
    for a, b in zip(
            jax.tree_util.tree_leaves(outs["interpret"][1].params),
            jax.tree_util.tree_leaves(outs["xla"][1].params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-6, rtol=2e-5)


def test_vmem_guard_falls_back_to_xla(monkeypatch):
    """When one accumulator exceeds DGCNN_STAGE_TAIL_VMEM_MB, the kernel
    impl must degrade to the XLA path instead of failing to compile —
    spy asserts the Pallas kernel is never invoked."""
    import dgcnn_tpu.kernels.scatter_pallas as sp

    def boom(*a, **k):  # pragma: no cover - failure path
        raise AssertionError("kernel path used despite VMEM guard")

    monkeypatch.setattr(sp, "scatter_stage_tail_rows", boom)
    monkeypatch.setenv("DGCNN_STAGE_TAIL_SCATTER", "kernel")
    monkeypatch.setenv("DGCNN_STAGE_TAIL_VMEM_MB", "0")
    a, bvec, idx, gamma, beta = _inputs(6)

    def loss(a):
        mx, _, _ = edge_stage_tail_train(a, bvec, idx, gamma, beta)
        return jnp.sum(mx)

    g_k = jax.grad(loss)(a)
    monkeypatch.setenv("DGCNN_STAGE_TAIL_SCATTER", "xla")
    monkeypatch.delenv("DGCNN_STAGE_TAIL_VMEM_MB")
    g_x = jax.grad(loss)(a)
    np.testing.assert_allclose(np.asarray(g_k), np.asarray(g_x),
                               rtol=1e-6, atol=1e-6)
