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


def test_train_loop_tensor_parallel_wired(tmp_path):
    """The --tensor_parallel path through train(): trunk sharded over 2 of
    the 8 virtual devices, one epoch trains, and the loss matches the
    unsharded run (annotation-only TP is numerics-preserving up to psum
    reassociation)."""
    import numpy as np

    from dgcnn_tpu.train.loop import train
    from dgcnn_tpu.utils.logging import IOStream

    rng = np.random.default_rng(0)
    data_dir = tmp_path / "rooms"
    data_dir.mkdir()
    for i in range(5):
        pts = rng.random((300, 4)) * 30
        labels = rng.integers(0, 5, (300, 1))
        np.save(data_dir / f"Area_{i}.npy", np.hstack([pts, labels]))

    kwargs = dict(
        data_dir=str(data_dir), num_points=64, epochs=1, num_classes=5,
        num_features=4, train_batch_size=4, validation_batch_size=4,
        emb_dims=64, validation_prop=0.25, dropout=0.0, seed=1,
        knn_impl="xla", tb_dir=str(tmp_path / "tb"),
    )
    io = IOStream(str(tmp_path / "log.txt"))
    s_tp = train(2, io, model_root=str(tmp_path / "m_tp"),
                 tensor_parallel=2, **kwargs)
    s_ref = train(2, io, model_root=str(tmp_path / "m_ref"),
                  data_parallel=False, **kwargs)
    assert s_tp["epoch"] == 0 and s_ref["epoch"] == 0
    assert abs(s_tp["val_balanced_accuracy"]
               - s_ref["val_balanced_accuracy"]) < 5e-3
