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


# ------------------------------------------------------------ banded ring
# parallel/ring_knn.py banding: spatial banding is certified per query
# against the x-sorted shard-boundary gap and falls back to the exact
# full ring via lax.cond — the result must be EXACT in every case.


@needs8
@pytest.mark.parametrize("band_shards", [1, 2])
def test_banded_ring_sorted_exact(band_shards, rng):
    """Dense x-sorted cloud: certificates pass, banded == exact kNN."""
    mesh = make_mesh(n_data=2, n_points=4)
    b, n, k = 2, 256, 7
    x = np.stack([
        np.stack([np.sort(rng.random(n).astype(np.float32) * 40.0),
                  rng.random(n).astype(np.float32) * 2.0,
                  rng.random(n).astype(np.float32) * 2.0], 1)
        for _ in range(b)
    ])
    want = np.asarray(knn(jnp.asarray(x), k, query_chunk=None))
    got = np.asarray(knn_sharded(jnp.asarray(x), k, mesh,
                                 band_shards=band_shards))
    np.testing.assert_array_equal(np.sort(got, -1), np.sort(want, -1))


@needs8
def test_banded_ring_unsorted_falls_back_exact(rng):
    """Unsorted input: the sortedness gate fails, the full-ring fallback
    runs, and the result is still exact."""
    mesh = make_mesh(n_data=2, n_points=4)
    b, n, k = 2, 128, 6
    x = rng.integers(0, 40, (b, n, 3)).astype(np.float32)
    x += rng.random((b, n, 3)).astype(np.float32) * 0.1
    want = np.asarray(knn(jnp.asarray(x), k, query_chunk=None))
    got = np.asarray(knn_sharded(jnp.asarray(x), k, mesh, band_shards=1))
    np.testing.assert_array_equal(np.sort(got, -1), np.sort(want, -1))


@needs8
def test_banded_ring_cert_failure_falls_back_exact(rng):
    """Sparse x-sorted cloud whose kNN spans more than the banded shards:
    certificates FAIL and the fallback must keep the result exact."""
    mesh = make_mesh(n_data=1, n_points=8)
    b, n, k = 1, 64, 12  # 8 pts/shard, k=12 -> neighbours cross >1 shard
    x = np.stack([np.sort(rng.random(n).astype(np.float32) * 40.0),
                  rng.random(n).astype(np.float32) * 0.5,
                  rng.random(n).astype(np.float32) * 0.5], 1)[None]
    want = np.asarray(knn(jnp.asarray(x), k, query_chunk=None))
    got = np.asarray(knn_sharded(jnp.asarray(x), k, mesh, band_shards=1))
    np.testing.assert_array_equal(np.sort(got, -1), np.sort(want, -1))


@needs8
def test_banded_ring_uncertified_feature_mode(rng):
    """certify=False (feature-space mode): bands when sorted_ok is True
    (agreement evidence-class, not exactness) and must be EXACT via the
    fallback when sorted_ok is False."""
    import functools

    from jax.sharding import PartitionSpec as P

    from dgcnn_tpu.parallel.ring_knn import ring_knn_local

    mesh = make_mesh(n_data=1, n_points=8)
    b, n, k = 1, 512, 5
    # spatially smooth features over sorted x: in-band neighbours
    xs = np.sort(rng.random(n).astype(np.float32) * 20.0)
    feats = np.stack([xs,
                      np.sin(xs).astype(np.float32),
                      np.cos(xs).astype(np.float32)], 1)[None]

    def run(sorted_ok):
        body = functools.partial(
            ring_knn_local, k=k, axis_name="points", band_shards=1,
            certify=False, sorted_ok=jnp.asarray(sorted_ok))
        spec = P(None, "points", None)
        return np.asarray(jax.jit(jax.shard_map(
            body, mesh=mesh, in_specs=(spec,), out_specs=spec,
        ))(jnp.asarray(feats)))

    want = np.asarray(knn(jnp.asarray(feats), k, query_chunk=None))
    got_fallback = run(False)
    np.testing.assert_array_equal(np.sort(got_fallback, -1),
                                  np.sort(want, -1))
    got_banded = run(True)
    agree = np.mean([
        len(np.intersect1d(got_banded[0, i], want[0, i])) / k
        for i in range(n)
    ])
    assert agree > 0.98, agree


@needs8
def test_banded_ring_uncertified_2d_mesh(rng):
    """certify=False on a ('data','points') 2-D mesh: the in-band flag is
    data-varying (per batch shard) — both cond branches must carry the
    same varying-manual-axes type (regression: unvarying True vs
    data-varying False crashed tracing)."""
    import functools

    from jax.sharding import PartitionSpec as P

    from dgcnn_tpu.parallel.ring_knn import ring_knn_local

    mesh = make_mesh(n_data=2, n_points=4)
    b, n, k = 2, 256, 5
    xs = np.stack([np.sort(rng.random(n).astype(np.float32) * 20.0)
                   for _ in range(b)])
    feats = np.stack([xs, np.sin(xs), np.cos(xs)], -1).astype(np.float32)

    def run(sorted_ok):
        body = functools.partial(
            ring_knn_local, k=k, axis_name="points", band_shards=1,
            certify=False, sorted_ok=jnp.asarray(sorted_ok))
        spec = P("data", "points", None)
        return np.asarray(jax.jit(jax.shard_map(
            body, mesh=mesh, in_specs=(spec,), out_specs=spec,
        ))(jnp.asarray(feats)))

    want = np.asarray(knn(jnp.asarray(feats), k, query_chunk=None))
    got_fallback = run(False)         # exact via full ring
    np.testing.assert_array_equal(np.sort(got_fallback, -1),
                                  np.sort(want, -1))
    got_banded = run(True)            # banded traces + runs on the 2-D mesh
    assert got_banded.shape == want.shape
