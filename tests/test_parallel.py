"""Mesh + ring-kNN tests on the 8-virtual-device CPU backend."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dgcnn_tpu.ops.knn import knn
from dgcnn_tpu.parallel.mesh import batch_sharding, make_mesh, replicated_sharding
from dgcnn_tpu.parallel.ring_knn import knn_sharded

needs8 = pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")


def test_make_mesh_shapes():
    mesh = make_mesh(n_data=4, n_points=2)
    assert mesh.shape == {"data": 4, "points": 2}
    mesh = make_mesh()  # all devices on data
    assert mesh.shape["data"] == len(jax.devices())


def test_make_mesh_too_many():
    with pytest.raises(ValueError, match="devices"):
        make_mesh(n_data=64, n_points=2)


@needs8
def test_shardings_place_arrays():
    mesh = make_mesh(n_data=8)
    x = jnp.zeros((16, 4))
    xs = jax.device_put(x, batch_sharding(mesh))
    assert len(xs.sharding.device_set) == 8
    xr = jax.device_put(x, replicated_sharding(mesh))
    assert xr.sharding.is_fully_replicated


@needs8
@pytest.mark.parametrize("n_points_axis", [2, 4, 8])
def test_ring_knn_matches_single_device(n_points_axis, rng):
    mesh = make_mesh(n_data=8 // n_points_axis, n_points=n_points_axis)
    b = mesh.shape["data"] * 2
    n, c, k = 64, 5, 7
    # jittered integer grid: unique distances -> order comparison is exact
    x = rng.integers(0, 40, (b, n, c)).astype(np.float32)
    x += rng.random((b, n, c)).astype(np.float32) * 0.1
    want = np.asarray(knn(jnp.asarray(x), k, query_chunk=None))
    got = np.asarray(knn_sharded(jnp.asarray(x), k, mesh))
    np.testing.assert_array_equal(np.sort(got, -1), np.sort(want, -1))
    # nearest-first order must match wherever distances are unique
    np.testing.assert_array_equal(got, want)


@needs8
def test_ring_knn_self_first(rng):
    mesh = make_mesh(n_data=2, n_points=4)
    x = jnp.asarray(rng.standard_normal((2, 32, 3)).astype(np.float32))
    idx = np.asarray(knn_sharded(x, 5, mesh))
    np.testing.assert_array_equal(
        idx[..., 0], np.broadcast_to(np.arange(32), (2, 32))
    )


@needs8
def test_ring_knn_indivisible_raises():
    mesh = make_mesh(n_data=2, n_points=4)
    with pytest.raises(ValueError, match="divisible"):
        knn_sharded(jnp.zeros((2, 30, 3)), 5, mesh)


@needs8
def test_ring_knn_k_exceeds_local_shard(rng):
    # k=12 > N_local=8: early hops must pad and later hops must fill
    mesh = make_mesh(n_data=1, n_points=8)
    x = rng.integers(0, 30, (1, 64, 4)).astype(np.float32)
    x += rng.random((1, 64, 4)).astype(np.float32) * 0.1
    want = np.asarray(knn(jnp.asarray(x), 12, query_chunk=None))
    got = np.asarray(knn_sharded(jnp.asarray(x), 12, mesh))
    np.testing.assert_array_equal(np.sort(got, -1), np.sort(want, -1))
