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


@needs8
@pytest.mark.parametrize("n_sp", [2, 4])
def test_sharded_train_step_matches_unsharded(n_sp, rng):
    """Point-sharded TRAINING: one step on a (data, points) mesh must match
    the unsharded train step — grads (via SGD-updated params, linear in the
    gradient), psum'd BN batch stats, loss and confusion matrix — at <=1e-5
    (dropout=0 so the only divergence is float reassociation in the psummed
    reductions; SGD rather than Adam because Adam's sign-normalisation
    amplifies float-noise-level differences of near-zero gradients to
    O(lr))."""
    from dgcnn_tpu.parallel.sharded_model import make_sharded_train_step
    from dgcnn_tpu.train.steps import (
        init_train_state,
        make_optimizer,
        make_train_step,
    )

    cfg = DGCNNConfig(num_classes=4, num_features=3, k=6, emb_dims=32,
                      dropout=0.0, knn_query_chunk=None)
    mesh = make_mesh(n_data=8 // n_sp, n_points=n_sp)
    b, n = mesh.shape["data"] * 2, 16 * n_sp
    x = _tie_free_points(rng, b, n)
    labels = jnp.asarray(rng.integers(0, 4, (b, n)))
    mask = jnp.asarray((rng.random((b, n)) < 0.7).astype(np.float32))

    tx = make_optimizer(use_sgd=True, lr=1e-5, epochs=2, steps_per_epoch=1)
    state = init_train_state(jax.random.key(0), cfg, tx)

    ref_step = make_train_step(cfg, tx, donate=False)
    ref_state, ref_m = ref_step(state, x, labels, mask)

    sh_step = make_sharded_train_step(cfg, tx, mesh)
    sh_state, sh_m = sh_step(state, x, labels, mask)

    assert float(sh_m["loss"]) == pytest.approx(float(ref_m["loss"]),
                                                rel=1e-5)
    np.testing.assert_allclose(np.asarray(sh_m["confusion"]),
                               np.asarray(ref_m["confusion"]), atol=0.5)
    for name in ("params", "bn_state"):
        a = jax.tree_util.tree_leaves(getattr(ref_state, name))
        c = jax.tree_util.tree_leaves(getattr(sh_state, name))
        for xa, xc in zip(a, c):
            np.testing.assert_allclose(np.asarray(xa), np.asarray(xc),
                                       atol=1e-5, rtol=1e-4)


@needs8
def test_sharded_train_step_dropout_runs(rng):
    """With dropout on, the sharded step must still run and produce a
    finite loss (per-shard dropout patterns differ from unsharded)."""
    from dgcnn_tpu.parallel.sharded_model import make_sharded_train_step
    from dgcnn_tpu.train.steps import init_train_state, make_optimizer

    cfg = DGCNNConfig(num_classes=4, num_features=3, k=6, emb_dims=32,
                      dropout=0.5, knn_query_chunk=None)
    mesh = make_mesh(n_data=4, n_points=2)
    x = _tie_free_points(rng, 4, 32)
    labels = jnp.asarray(rng.integers(0, 4, (4, 32)))
    mask = jnp.ones((4, 32), jnp.float32)
    tx = make_optimizer()
    state = init_train_state(jax.random.key(0), cfg, tx)
    new_state, m = make_sharded_train_step(cfg, tx, mesh)(
        state, x, labels, mask)
    assert np.isfinite(float(m["loss"]))
    assert int(new_state.step) == 1


@needs8
def test_sharded_train_banded_branch_engages_and_matches(rng):
    """Dense x-sorted cloud: the stage-1 banded ring CERTIFIES (asserted
    via the in-band flag), so the banded kNN + banded gather branches run
    in forward AND backward (lax.cond VJP) — and the train step still
    matches the unsharded one at <=1e-5 (exactness through the banded
    path)."""

    from jax.sharding import PartitionSpec as P

    from dgcnn_tpu.parallel.ring_knn import ring_knn_local
    from dgcnn_tpu.parallel.sharded_model import make_sharded_train_step
    from dgcnn_tpu.train.steps import (
        init_train_state,
        make_optimizer,
        make_train_step,
    )

    cfg = DGCNNConfig(num_classes=4, num_features=3, k=6, emb_dims=32,
                      dropout=0.0, knn_query_chunk=None)
    assert cfg.ring_band_shards == 1  # the default under test
    mesh = make_mesh(n_data=2, n_points=4)
    b, n = 2, 1024
    # dense sorted x, tiny y/z: kNN radius << shard width -> cert passes
    x = np.stack([
        np.stack([np.sort(rng.random(n).astype(np.float32) * 40.0),
                  rng.random(n).astype(np.float32) * 0.3,
                  rng.random(n).astype(np.float32) * 0.3], 1)
        for _ in range(b)
    ])
    x = jnp.asarray(x)
    labels = jnp.asarray(rng.integers(0, 4, (b, n)))
    mask = jnp.ones((b, n), jnp.float32)

    # the banded branch must actually engage on this data
    def body(xl):
        idx, flag = ring_knn_local(xl, cfg.k, "points", band_shards=1,
                                   with_flag=True)
        return idx, flag.reshape(1)

    spec = P("data", "points", None)
    _, flag = jax.jit(jax.shard_map(
        body, mesh=mesh, in_specs=(spec,),
        out_specs=(spec, P("data")),
    ))(x)
    assert bool(np.asarray(flag).all()), "certificate unexpectedly failed"

    tx = make_optimizer(use_sgd=True, lr=1e-5, epochs=2, steps_per_epoch=1)
    state = init_train_state(jax.random.key(0), cfg, tx)
    ref_state, ref_m = make_train_step(cfg, tx, donate=False)(
        state, x, labels, mask)
    sh_state, sh_m = make_sharded_train_step(cfg, tx, mesh)(
        state, x, labels, mask)
    assert float(sh_m["loss"]) == pytest.approx(float(ref_m["loss"]),
                                                rel=1e-5)
    for name in ("params", "bn_state"):
        a = jax.tree_util.tree_leaves(getattr(ref_state, name))
        c = jax.tree_util.tree_leaves(getattr(sh_state, name))
        for xa, xc in zip(a, c):
            np.testing.assert_allclose(np.asarray(xa), np.asarray(xc),
                                       atol=1e-5, rtol=1e-4)
