"""Tensor-parallel (channel-sharded conv6/bn6/conv7) eval forward on the
virtual 8-device mesh: placement-only TP must match the replicated forward
and actually split the trunk weights."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dgcnn_tpu.models.dgcnn import DGCNNConfig, apply_dgcnn, init_dgcnn
from dgcnn_tpu.parallel.mesh import make_mesh
from dgcnn_tpu.parallel.tensor_parallel import shard_params_tp, tp_shard_info

needs8 = pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")


@needs8
@pytest.mark.parametrize("n_tp", [2, 8])
def test_tp_forward_matches_replicated(n_tp, rng):
    cfg = DGCNNConfig(num_classes=4, num_features=3, k=6, emb_dims=64,
                      knn_query_chunk=None)
    mesh = make_mesh(n_data=8 // n_tp, n_points=n_tp)
    params, state = init_dgcnn(jax.random.key(0), cfg)
    x = jnp.asarray(rng.standard_normal((2, 48, 3)), jnp.float32)
    want, _ = apply_dgcnn(params, state, x, cfg)

    p_tp, s_tp = shard_params_tp(params, state, mesh)
    fwd = jax.jit(lambda p, s, v: apply_dgcnn(p, s, v, cfg)[0])
    got = fwd(p_tp, s_tp, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-4, rtol=1e-4)

    info = tp_shard_info(p_tp)
    w6 = params["conv6"]["w"]
    assert info["['conv6']['w']"] == w6.size * 4 // n_tp  # genuinely split
    w7 = params["conv7"]["w"]
    assert info["['conv7']['w']"] == w7.size * 4 // n_tp


@needs8
def test_tp_indivisible_raises():
    cfg = DGCNNConfig(num_classes=4, num_features=3, k=6, emb_dims=60)
    mesh = make_mesh(n_data=1, n_points=8)
    params, state = init_dgcnn(jax.random.key(0), cfg)
    with pytest.raises(ValueError, match="divide"):
        shard_params_tp(params, state, mesh)
