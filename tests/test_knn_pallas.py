"""Pallas fused kNN kernel tests (interpreter mode on CPU): exact agreement
with the XLA reference path, including tie order and padding edges."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dgcnn_tpu.kernels.knn_pallas import knn_pallas
from dgcnn_tpu.ops.knn import knn


@pytest.mark.parametrize("shape,k", [
    ((1, 128, 8), 5),       # aligned N
    ((2, 200, 4), 7),       # unaligned N (pad path) + unaligned k
    ((1, 384, 16), 16),     # k multiple of 8
    ((2, 100, 3), 30),      # C below pad, k large vs N
])
def test_pallas_matches_xla_exact(shape, k, rng):
    x = jnp.asarray(rng.integers(0, 25, shape).astype(np.float32))
    want = np.asarray(knn(x, k, query_chunk=None))
    got = np.asarray(knn_pallas(x, k, query_tile=128, interpret=True))
    np.testing.assert_array_equal(got, want)


def test_pallas_self_first(rng):
    x = jnp.asarray(rng.standard_normal((2, 160, 6)).astype(np.float32))
    idx = np.asarray(knn_pallas(x, 4, query_tile=64, interpret=True))
    np.testing.assert_array_equal(
        idx[..., 0], np.broadcast_to(np.arange(160), (2, 160))
    )


def test_pallas_tie_breaking_duplicates(rng):
    # duplicated points create exact score ties; order must match lax.top_k
    base = rng.integers(0, 10, (1, 64, 4)).astype(np.float32)
    x = jnp.asarray(np.concatenate([base, base[:, :32]], axis=1))
    want = np.asarray(knn(x, 6, query_chunk=None))
    got = np.asarray(knn_pallas(x, 6, query_tile=32, interpret=True))
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("n,c,k,packed", [
    (64, 1, 1, False),      # minimal dims
    (129, 2, 13, False),    # everything unaligned
    (256, 65, 64, False),   # C above one lane tile, large k
    (200, 4, 30, True),     # production k, packed
    (513, 9, 8, True),      # unaligned N/C, packed
])
def test_pallas_shape_stress(n, c, k, packed, rng):
    x = jnp.asarray(rng.integers(0, 9, (1, n, c)).astype(np.float32))
    want = np.asarray(knn(x, k, query_chunk=None))
    got = np.asarray(
        knn_pallas(x, k, query_tile=128, interpret=True, packed=packed)
    )
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("splits,k", [(2, 30), (4, 7)])
def test_pallas_split_variant_exact(splits, k, rng):
    x = jnp.asarray(rng.integers(0, 9, (1, 256, 4)).astype(np.float32))
    want = np.asarray(knn(x, k, query_chunk=None))
    got = np.asarray(knn_pallas(x, k, query_tile=128, interpret=True,
                                packed=True, splits=splits))
    np.testing.assert_array_equal(got, want)


def test_pallas_query_tile_invariance(rng):
    x = jnp.asarray(rng.integers(0, 30, (1, 192, 5)).astype(np.float32))
    a = np.asarray(knn_pallas(x, 9, query_tile=64, interpret=True))
    b = np.asarray(knn_pallas(x, 9, query_tile=192, interpret=True))
    np.testing.assert_array_equal(a, b)


def test_packed_adversarial_score_spread(rng):
    """Regression for the wrapped-subtract extraction (CLAUDE.md): mixed-sign
    scores with extreme magnitude spread in one row must not corrupt the
    packed selection — a wrapped-subtract on full 31-bit keys (no >>1)
    silently broke exactly this case. Packed ranks at 18-bit key precision,
    so we assert high top-k set recall against the exact path, plus exact
    agreement of the f32 kernel with lax.top_k on the same data."""
    b, n, k = 2, 256, 10
    # clusters at wildly different scales + signs: distances span ~1e-6..1e8
    base = rng.standard_normal((b, n, 3)).astype(np.float32)
    scale = 10.0 ** rng.integers(-3, 4, (b, n, 1))
    x = jnp.asarray(base * scale)

    want = knn(x, k, query_chunk=None)
    exact = knn_pallas(x, k, interpret=True)
    np.testing.assert_array_equal(np.asarray(exact), np.asarray(want))

    packed = np.asarray(knn_pallas(x, k, packed=True, interpret=True))
    w = np.asarray(want)
    recall = np.mean([
        len(set(packed[bi, i]) & set(w[bi, i])) / k
        for bi in range(b) for i in range(n)
    ])
    assert recall > 0.9, recall


def test_capped_matches_packed_when_no_overflow(rng):
    """Hierarchical capped kernel == flat packed kernel (same keys, same
    tie order) whenever no window holds more than ``cap`` of a row's
    top-k. With cap >= k every window trivially satisfies that, so the
    outputs must be bit-identical — including on spatially sorted data."""
    x = rng.uniform(0, 30, (2, 300, 3)).astype(np.float32)
    x = np.stack([xi[np.argsort(xi[:, 0])] for xi in x])
    xj = jnp.asarray(x)
    k = 10
    flat = np.asarray(knn_pallas(xj, k, packed=True, interpret=True))
    capped = np.asarray(knn_pallas(
        xj, k, packed=True, cap=k, window=128, interpret=True))
    np.testing.assert_array_equal(capped, flat)


def test_capped_high_recall_production_regime(rng):
    """At the production shape ratio (window count >> k/cap) the capped
    kernel must agree with the flat packed kernel on ~all neighbours of
    spatially sorted LiDAR-like data: the stride dispersal sends adjacent
    points to different windows, so per-window load ~ Poisson(k/W)."""
    n, k = 3000, 30
    x = rng.uniform(0, 30, (2, n, 3)).astype(np.float32)
    x = np.stack([xi[np.argsort(xi[:, 0])] for xi in x])
    x[..., 2] = rng.uniform(0, 5, (2, n))
    xj = jnp.asarray(x)
    flat = np.asarray(knn_pallas(xj, k, packed=True, interpret=True))
    capped = np.asarray(knn_pallas(
        xj, k, packed=True, cap=8, window=128, interpret=True))
    agree = np.mean(capped == flat)
    assert agree > 0.999, agree


def test_capped_adversarial_modular_cluster(rng):
    """Documented failure mode: points whose indices share a residue class
    mod W collapse into ONE window after stride dispersal; if > cap of a
    query's top-k are such points the tail is lost. The kernel must
    degrade gracefully — still return valid, unique indices with the head
    of the ranking intact."""
    n, k, window = 512, 12, 128
    n_win = 512 // window  # 4 windows
    x = rng.uniform(0, 100, (1, n, 3)).astype(np.float32)
    # plant a tight cluster at indices = 5 mod 4... all in one window:
    # stride dispersal maps original o to window (o mod W), so pick
    # indices congruent mod n_win.
    cluster = np.arange(1, 1 + n_win * (k + 4), n_win)  # same residue
    x[0, cluster] = np.float32([50, 50, 50]) + rng.normal(
        0, 1e-3, (len(cluster), 3)).astype(np.float32)
    xj = jnp.asarray(x)
    capped = np.asarray(knn_pallas(
        xj, k, packed=True, cap=4, window=window, interpret=True))
    flat = np.asarray(knn_pallas(xj, k, packed=True, interpret=True))
    q = int(cluster[0])
    # all indices valid and unique, and the head must come from the
    # planted cluster (its members are mutually closer than anything
    # else). Exact head ORDER is not comparable across kernels here: the
    # cluster's pairwise distances (~1e-3 -> d^2 ~ 1e-6) sit below the
    # f32 score-cancellation noise (~1e-4 at these coordinates), so the
    # flat and capped kernels' different accumulation orders may rank
    # these physically-indistinguishable neighbours differently.
    assert capped.min() >= 0 and capped.max() < n
    assert len(set(capped[0, q])) == k
    cluster_set = set(int(c) for c in cluster)
    assert set(capped[0, q, :4].tolist()) <= cluster_set
    assert set(flat[0, q, :4].tolist()) <= cluster_set


@pytest.mark.parametrize("uc,um", [(0, 0), (1, 1), (0, 1), (2, 0), (4, 1)])
def test_capped_unroll_variants_identical(uc, um, rng):
    """The capped kernel's loop-structure knobs (python-unrolled vs fori
    cap/merge loops — a compile-time/runtime trade, see
    scripts/exp_capped_unroll.py) must not change results: every variant
    is the same extraction algorithm."""
    x = rng.uniform(0, 30, (2, 700, 3)).astype(np.float32)
    x = np.stack([xi[np.argsort(xi[:, 0])] for xi in x])
    xj = jnp.asarray(x)
    k = 13
    base = np.asarray(knn_pallas(
        xj, k, packed=True, cap=4, window=128, interpret=True))
    out = np.asarray(knn_pallas(
        xj, k, packed=True, cap=4, window=128, interpret=True,
        unroll_cap=uc, unroll_merge=um))
    np.testing.assert_array_equal(out, base)


def test_capped_small_n_capacity_fallback(rng):
    """When total extraction capacity (windows x cap) is below k, the
    capped kernel cannot produce k distinct neighbours (the merge would
    cycle duplicates into the tail) — the wrapper must fall back to the
    flat packed kernel and return the identical, duplicate-free result.
    Regression test for the capacity bug found in review."""
    x = jnp.asarray(rng.uniform(0, 30, (2, 500, 3)).astype(np.float32))
    k = 30  # n_pad=512 at window=256 -> 2 windows x cap 8 = 16 < 30
    capped = np.asarray(knn_pallas(x, k, packed=True, cap=8, window=256,
                                   interpret=True))
    flat = np.asarray(knn_pallas(x, k, packed=True, interpret=True))
    np.testing.assert_array_equal(capped, flat)
    for b in range(capped.shape[0]):
        for i in range(0, capped.shape[1], 37):
            assert len(set(capped[b, i])) == k


def test_packed_wide_index_large_n(rng):
    """n_pad above 8192 widens the packed index field (14-15 bits) instead
    of abandoning the packed kernels: selection stays near-exact (score
    keys narrow from 18 to 17-16 bits) and the capped kernel still equals
    the flat packed kernel without window overflow."""
    n, k = 10000, 12  # n_pad 10240 -> idx_bits 14
    x = rng.uniform(0, 50, (1, n, 3)).astype(np.float32)
    x = x[:, np.argsort(x[0, :, 0])]
    xj = jnp.asarray(x)
    packed = np.asarray(knn_pallas(xj, k, packed=True, interpret=True))
    exact = np.asarray(knn_pallas(xj, k, interpret=True))
    agree = np.mean(np.sort(packed, -1) == np.sort(exact, -1))
    assert agree > 0.99, agree
    assert packed.min() >= 0 and packed.max() < n
    capped = np.asarray(knn_pallas(xj, k, packed=True, cap=k, window=256,
                                   interpret=True))
    cagree = np.mean(np.sort(capped, -1) == np.sort(packed, -1))
    assert cagree > 0.995, cagree  # near-tie order noise only


def test_packed_recall_vs_exact_production_regime(rng):
    """Quantitative floor for the recentered packed keys: neighbour-set
    recall vs the f32-exact kernel must stay >= 0.995 on LiDAR-like 30 m
    blocks (measured 0.9995 at the production shape after the per-query
    |q|^2 recentering; 0.93 before it — this guards the recentering)."""
    n, k = 3000, 30
    x = rng.uniform(0, 30, (1, n, 3)).astype(np.float32)
    x[0, :, 2] = rng.uniform(0, 5, n)
    x = x[:, np.argsort(x[0, :, 0])]
    xj = jnp.asarray(x)
    packed = np.asarray(knn_pallas(xj, k, packed=True, interpret=True))
    exact = np.asarray(knn_pallas(xj, k, interpret=True))
    recall = np.mean([
        len(set(packed[0, i]) & set(exact[0, i])) / k
        for i in range(0, n, 13)
    ])
    assert recall >= 0.995, recall


def test_autotune_tiles_sweep_and_cache(tmp_path, monkeypatch):
    """Unknown device generations micro-sweep the query tile and cache the
    winner keyed by device_kind; a second resolve reads the cache without
    re-measuring (kernels/knn_pallas.py autotune path)."""
    from dgcnn_tpu.kernels import knn_pallas as kp

    monkeypatch.setenv("DGCNN_AUTOTUNE_DIR", str(tmp_path))
    monkeypatch.setattr(kp, "_device_kind", lambda: "TPU v99 test")
    monkeypatch.setattr(kp, "_AUTOTUNED", False)

    calls = []

    def fake_measure(packed, qt):
        calls.append((packed, qt))
        # packed fastest at 512, f32 fastest at 128
        return {True: {128: 9, 256: 8, 384: 7, 512: 5},
                False: {128: 2, 256: 4, 384: 6, 512: 8}}[packed][qt]

    got = kp._autotuned_tiles(measure=fake_measure)
    assert got == (512, 128)
    assert len(calls) == 8
    import json
    import os

    path = kp._autotune_cache_path()
    assert os.path.exists(path)
    assert json.load(open(path))["packed"] == 512

    # cache hit: no more measuring (even with the sentinel reset)
    monkeypatch.setattr(kp, "_AUTOTUNED", False)
    calls.clear()
    got2 = kp._autotuned_tiles(measure=fake_measure)
    assert got2 == (512, 128) and calls == []

    # _default_query_tile resolves through the cache for unknown kinds
    monkeypatch.setattr(kp, "_AUTOTUNED", False)
    monkeypatch.delenv("DGCNN_KNN_QUERY_TILE", raising=False)
    assert kp._default_query_tile(True) == 512
    assert kp._default_query_tile(False) == 128

    # known generations never consult autotune
    monkeypatch.setattr(kp, "_device_kind", lambda: "TPU v5 lite")
    assert kp._default_query_tile(True) == 384


def test_autotune_disabled_falls_back(tmp_path, monkeypatch):
    from dgcnn_tpu.kernels import knn_pallas as kp

    monkeypatch.setenv("DGCNN_AUTOTUNE_DIR", str(tmp_path))
    monkeypatch.setenv("DGCNN_KNN_AUTOTUNE", "0")
    monkeypatch.setattr(kp, "_device_kind", lambda: "TPU v98 test")
    monkeypatch.setattr(kp, "_AUTOTUNED", False)
    assert kp._autotuned_tiles() is None
    assert kp._default_query_tile(True) == kp._DEFAULT_TILES[0]
