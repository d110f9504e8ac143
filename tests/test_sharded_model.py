"""Point-sharded eval forward vs the single-device forward (8 virtual CPU
devices)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dgcnn_tpu.models.dgcnn import DGCNNConfig, apply_dgcnn, init_dgcnn
from dgcnn_tpu.parallel.mesh import make_mesh
from dgcnn_tpu.parallel.sharded_model import apply_dgcnn_sharded

needs8 = pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")

CFG = DGCNNConfig(num_classes=4, num_features=3, k=6, emb_dims=32,
                  knn_query_chunk=None)


def _tie_free_points(rng, b, n, c=3):
    x = rng.integers(0, 30, (b, n, c)).astype(np.float32)
    x += rng.random((b, n, c)).astype(np.float32) * 0.1
    return jnp.asarray(x)


@needs8
@pytest.mark.parametrize("n_sp", [2, 4, 8])
def test_sharded_forward_matches_unsharded(n_sp, rng):
    mesh = make_mesh(n_data=8 // n_sp, n_points=n_sp)
    b = mesh.shape["data"] * 2
    x = _tie_free_points(rng, b, 64)
    params, state = init_dgcnn(jax.random.key(0), CFG)
    want, _ = apply_dgcnn(params, state, x, CFG)
    got = apply_dgcnn_sharded(params, state, x, CFG, mesh)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), atol=1e-4, rtol=1e-4
    )


@needs8
def test_sharded_forward_negative_gamma(rng):
    """Stage-3 fold must hold under sharding with negative BN scales."""
    mesh = make_mesh(n_data=4, n_points=2)
    params, state = init_dgcnn(jax.random.key(1), CFG)
    g = np.asarray(params["bn5"]["gamma"]).copy()
    g[::3] *= -1
    params["bn5"] = dict(params["bn5"], gamma=jnp.asarray(g))
    x = _tie_free_points(rng, 4, 48)
    want, _ = apply_dgcnn(params, state, x, CFG)
    got = apply_dgcnn_sharded(params, state, x, CFG, mesh)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), atol=1e-4, rtol=1e-4
    )


@needs8
def test_sharded_indivisible_raises():
    mesh = make_mesh(n_data=2, n_points=4)
    params, state = init_dgcnn(jax.random.key(0), CFG)
    with pytest.raises(ValueError, match="divisible"):
        apply_dgcnn_sharded(params, state, jnp.zeros((2, 30, 3)), CFG, mesh)
