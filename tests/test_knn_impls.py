"""Cross-implementation kNN agreement and model-forward consistency across
knn_impl choices (xla / approx / pallas / pallas_packed)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dgcnn_tpu.models.dgcnn import DGCNNConfig, apply_dgcnn, init_dgcnn
from dgcnn_tpu.ops.knn import knn


def _grid_points(rng, b=2, n=96, c=4):
    x = rng.integers(0, 25, (b, n, c)).astype(np.float32)
    x += rng.random((b, n, c)).astype(np.float32) * 0.1  # break exact ties
    return jnp.asarray(x)


def test_approx_knn_high_recall(rng):
    x = _grid_points(rng, n=512, c=8)
    exact = np.sort(np.asarray(knn(x, 16, query_chunk=None)), -1)
    approx = np.sort(np.asarray(knn(x, 16, query_chunk=None, approx=True)), -1)
    recall = (exact == approx).mean()
    assert recall > 0.9, recall


@pytest.mark.parametrize("impl", ["xla", "pallas"])
def test_forward_same_logits_across_exact_impls(impl, rng):
    """Exact impls must produce identical logits on tie-free data. (The
    packed kernel ranks at reduced score precision, so deeper stages can
    legitimately pick different near-equidistant neighbours — covered by
    the closeness test below.)"""
    cfg_ref = DGCNNConfig(num_classes=4, num_features=4, k=6, emb_dims=32,
                          knn_query_chunk=None, knn_impl="xla")
    cfg = DGCNNConfig(num_classes=4, num_features=4, k=6, emb_dims=32,
                      knn_query_chunk=None, knn_impl=impl)
    params, state = init_dgcnn(jax.random.key(0), cfg_ref)
    x = _grid_points(rng)
    want, _ = apply_dgcnn(params, state, x, cfg_ref)
    got, _ = apply_dgcnn(params, state, x, cfg)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-5, rtol=1e-5)


@pytest.mark.parametrize("impl", ["approx", "pallas_packed"])
def test_forward_reduced_precision_impls_close(impl, rng):
    cfg_ref = DGCNNConfig(num_classes=4, num_features=4, k=6, emb_dims=32,
                          knn_query_chunk=None, knn_impl="xla")
    cfg = DGCNNConfig(num_classes=4, num_features=4, k=6, emb_dims=32,
                      knn_query_chunk=None, knn_impl=impl)
    params, state = init_dgcnn(jax.random.key(0), cfg_ref)
    x = _grid_points(rng)
    want, _ = apply_dgcnn(params, state, x, cfg_ref)
    got, _ = apply_dgcnn(params, state, x, cfg)
    diff = np.abs(np.asarray(got) - np.asarray(want))
    assert np.median(diff) < 0.05, float(np.median(diff))


def test_forward_approx_close(rng):
    cfg_ref = DGCNNConfig(num_classes=4, num_features=4, k=6, emb_dims=32,
                          knn_query_chunk=None, knn_impl="xla")
    cfg = DGCNNConfig(num_classes=4, num_features=4, k=6, emb_dims=32,
                      knn_query_chunk=None, knn_impl="approx")
    params, state = init_dgcnn(jax.random.key(0), cfg_ref)
    x = _grid_points(rng)
    want, _ = apply_dgcnn(params, state, x, cfg_ref)
    got, _ = apply_dgcnn(params, state, x, cfg)
    # approx may miss a neighbour occasionally; logits stay close
    diff = np.abs(np.asarray(got) - np.asarray(want))
    assert np.median(diff) < 0.05


def test_train_grad_flows_through_pallas_impl(rng):
    """stop_gradient on kNN inputs must not block feature gradients."""
    cfg = DGCNNConfig(num_classes=3, num_features=4, k=5, emb_dims=16,
                      knn_query_chunk=None, knn_impl="pallas")
    params, state = init_dgcnn(jax.random.key(0), cfg)
    x = _grid_points(rng, b=1, n=48)
    labels = jnp.zeros((1, 48), jnp.int32)

    def loss(p):
        logits, _ = apply_dgcnn(p, state, x, cfg, train=True,
                                rng=jax.random.key(1))
        return jnp.mean(
            -jax.nn.log_softmax(logits)[..., 0]
        )

    grads = jax.grad(loss)(params)
    norms = [float(jnp.abs(g).max()) for g in jax.tree_util.tree_leaves(grads)]
    assert max(norms) > 0.0


def test_collate_pcs_reference_signature(rng):
    from dgcnn_tpu.data.dataset import collate_pcs

    samples = [
        (rng.random((10, 4)).astype(np.float32), rng.integers(0, 3, 10), 0),
        (rng.random((7, 4)).astype(np.float32), rng.integers(0, 3, 7), 1),
    ]
    p, l, idxs = collate_pcs(samples)
    assert p.shape == (2, 7, 4) and l.shape == (2, 7)
    np.testing.assert_array_equal(idxs, [0, 1])
