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


@pytest.mark.parametrize("copies", [2, 4])
def test_scatter_pallas_copies_variants(copies, rng):
    """The accumulator-copies knob (rotating rows across independent VMEM
    accumulators to break the serial RMW chain) must be a pure perf knob:
    results equal the single-accumulator kernel up to f32 sum order."""
    from dgcnn_tpu.kernels.scatter_pallas import scatter_add_rows

    b, m, c, n = 2, 500, 16, 40
    dy = jnp.asarray(rng.standard_normal((b, m, c)), jnp.float32)
    idx = jnp.asarray(rng.integers(0, n, (b, m)), jnp.int32)
    got = scatter_add_rows(dy, idx, n, chunk=128, copies=copies,
                           interpret=True)
    want = jnp.zeros((b, n, c)).at[jnp.arange(b)[:, None], idx].add(dy)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
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
