"""kNN graph builder tests: analytic golden values + brute-force cross-check
+ chunked/unchunked agreement (reference semantics: /root/reference/model.py:25-40)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dgcnn_tpu.ops.knn import knn, pairwise_neg_sqdist


def brute_force_knn(x: np.ndarray, k: int) -> np.ndarray:
    """O(N²) numpy reference with lowest-index tie-breaking."""
    b, n, _ = x.shape
    out = np.zeros((b, n, k), np.int32)
    for bi in range(b):
        d = ((x[bi, :, None, :] - x[bi, None, :, :]) ** 2).sum(-1)
        # stable sort on distance -> ties resolved by lower index
        out[bi] = np.argsort(d, axis=-1, kind="stable")[:, :k]
    return out


def test_pairwise_neg_sqdist_golden():
    q = jnp.array([[[0.0, 0.0], [1.0, 0.0]]])
    c = jnp.array([[[0.0, 0.0], [0.0, 2.0], [3.0, 4.0]]])
    got = pairwise_neg_sqdist(q, c)
    want = -np.array([[[0.0, 4.0, 25.0], [1.0, 5.0, 20.0]]])
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-5)


def test_knn_line_of_points():
    # points on a line at x = 0, 1, 2, ..., 7: neighbours are obvious
    pts = jnp.arange(8.0)[None, :, None] * jnp.ones((1, 8, 3))
    idx = np.asarray(knn(pts, 3, query_chunk=None))
    assert idx[0, 0].tolist() == [0, 1, 2]
    assert idx[0, 7].tolist() == [7, 6, 5]
    # interior point: self first, then the two adjacent (tie -> lower index)
    assert idx[0, 3, 0] == 3
    assert set(idx[0, 3, 1:].tolist()) == {2, 4}


def test_knn_self_always_first():
    x = jax.random.normal(jax.random.key(0), (2, 64, 4))
    idx = np.asarray(knn(x, 5, query_chunk=None))
    np.testing.assert_array_equal(
        idx[..., 0], np.broadcast_to(np.arange(64), (2, 64))
    )


@pytest.mark.parametrize("chunk", [None, 16, 37, 64, 128])
def test_knn_matches_brute_force(chunk, rng):
    # integer coordinates -> squared distances exact in f32, so ties are
    # exact on both sides and broken identically (lower index first)
    x = rng.integers(0, 20, (2, 100, 4)).astype(np.float32)
    idx = np.asarray(knn(jnp.asarray(x), 7, query_chunk=chunk))
    want = brute_force_knn(x, 7)
    np.testing.assert_array_equal(idx, want)


def test_knn_non_divisible_tail_chunk(rng):
    x = jnp.asarray(rng.integers(0, 15, (1, 53, 3)).astype(np.float32))
    idx = np.asarray(knn(x, 4, query_chunk=16))
    want = brute_force_knn(np.asarray(x), 4)
    np.testing.assert_array_equal(idx, want)


def test_knn_chunked_equals_unchunked(rng):
    x = jnp.asarray(rng.standard_normal((1, 200, 8)).astype(np.float32))
    a = np.asarray(knn(x, 10, query_chunk=None))
    b = np.asarray(knn(x, 10, query_chunk=48))
    np.testing.assert_array_equal(a, b)
