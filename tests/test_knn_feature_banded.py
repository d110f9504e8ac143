"""Feature-space banded kNN (kernels/knn_pallas.py::
knn_pallas_feature_banded).

Stages 2-3 of DGCNN re-knn in learned feature space; on x-sorted blocks
the features are spatially smooth, so a contiguous row band holds the
true neighbours (measured 0.99997 in-band recall at band=4096 on the
trained model — scripts/exp_feature_band_offline.py). The kernel is
UNcertified (no repair), so these tests build feature tables whose
neighbourhoods are row-local BY CONSTRUCTION and demand exact agreement,
plus the runtime/static fallbacks.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dgcnn_tpu.kernels.knn_pallas import (
    knn_pallas,
    knn_pallas_feature_banded,
)
from dgcnn_tpu.ops.knn import knn

FB = dict(band=512, n_win=16, cap=8, query_tile=128, interpret=True)
T = jnp.asarray(True)
F = jnp.asarray(False)


def local_features(rng, b, n, c):
    """Integer feature table whose rows vary smoothly with row index:
    row i's nearest rows are within +-8 of i, far inside any band. Integer
    coords keep packed-key quantization exact (see test_knn_banded.py)."""
    base = np.cumsum(rng.integers(0, 3, (b, n, 1)), axis=1)
    jitter = rng.integers(0, 4, (b, n, c))
    return jnp.asarray((base + jitter).astype(np.float32))


def test_feature_banded_matches_exact_on_local_features(rng):
    f = local_features(rng, 2, 1600, 6)
    want = np.asarray(knn(f, 8, query_chunk=None))
    got = np.asarray(knn_pallas_feature_banded(f, 8, sorted_ok=T, **FB))
    np.testing.assert_array_equal(got, want)


def test_feature_banded_unaligned_n_and_k(rng):
    f = local_features(rng, 1, 1111, 5)
    want = np.asarray(knn(f, 7, query_chunk=None))
    got = np.asarray(knn_pallas_feature_banded(f, 7, sorted_ok=T, **FB))
    np.testing.assert_array_equal(got, want)


def test_feature_banded_unsorted_flag_falls_back_to_capped(rng):
    f = jnp.asarray(rng.uniform(0, 30, (1, 1600, 8)).astype(np.float32))
    want = np.asarray(knn_pallas(f, 8, packed=True, cap=8, unroll_cap=0,
                                 interpret=True))
    got = np.asarray(knn_pallas_feature_banded(f, 8, sorted_ok=F, **FB))
    np.testing.assert_array_equal(got, want)


def test_feature_banded_small_input_uses_capped(rng):
    f = local_features(rng, 1, 300, 4)
    want = np.asarray(knn_pallas(f, 8, packed=True, cap=8, unroll_cap=0,
                                 interpret=True))
    got = np.asarray(knn_pallas_feature_banded(f, 8, sorted_ok=T, **FB))
    np.testing.assert_array_equal(got, want)


def test_feature_banded_validation():
    f = jnp.zeros((1, 1600, 4))
    with pytest.raises(ValueError, match="band"):
        knn_pallas_feature_banded(f, 8, sorted_ok=T, band=500,
                                  interpret=True)
    with pytest.raises(ValueError, match="capacity"):
        knn_pallas_feature_banded(f, 8, sorted_ok=T, band=512, n_win=2,
                                  cap=3, interpret=True)
    with pytest.raises(ValueError, match="exceeds"):
        knn_pallas_feature_banded(jnp.zeros((1, 4, 3)), 8, sorted_ok=T,
                                  interpret=True)


def test_recall_guard_trips_on_decorrelated_features(rng):
    """Adversarial geometry: the feature table is a random permutation of
    row order (x-order does NOT localise the feature graph). The sampled
    recall of a 512-wide band over 1536 rows is ~1/3 — the runtime guard
    must fall back to the full capped kernel (bit-equal result) instead
    of silently returning the degraded banded graph."""
    f = jnp.asarray(rng.uniform(0, 30, (1, 1536, 8)).astype(np.float32))
    want = np.asarray(knn_pallas(f, 8, packed=True, cap=8, unroll_cap=0,
                                 interpret=True))
    got = np.asarray(knn_pallas_feature_banded(f, 8, sorted_ok=T, **FB))
    np.testing.assert_array_equal(got, want)


def test_recall_guard_keeps_banded_on_local_features(rng):
    """Row-local features: guard ON must return the identical result to
    guard OFF (the banded graph survives — no spurious fallback)."""
    f = local_features(rng, 1, 1600, 6)
    off = np.asarray(knn_pallas_feature_banded(
        f, 8, sorted_ok=T, recall_guard=0, **FB))
    on = np.asarray(knn_pallas_feature_banded(
        f, 8, sorted_ok=T, recall_guard=128, **FB))
    np.testing.assert_array_equal(on, off)


def test_recall_guard_knob_validation():
    from dgcnn_tpu.models.dgcnn import DGCNNConfig

    with pytest.raises(ValueError, match="knn_band_recall_guard"):
        DGCNNConfig(knn_band_recall_guard=-1)
    with pytest.raises(ValueError, match="knn_band_recall_threshold"):
        DGCNNConfig(knn_band_recall_threshold=1.5)
    cfg = DGCNNConfig(knn_band_recall_guard=0)
    assert cfg.knn_band_recall_guard == 0


def test_model_knob_wiring(rng):
    from dgcnn_tpu.models.dgcnn import DGCNNConfig, apply_dgcnn, init_dgcnn

    with pytest.raises(ValueError, match="knn_band_feature"):
        DGCNNConfig(knn_band_feature=100)

    cfg = DGCNNConfig(num_classes=3, num_features=4, k=6, emb_dims=64,
                      knn_impl="pallas_capped", knn_band=512,
                      knn_band_feature=512)
    params, state = init_dgcnn(jax.random.key(0), cfg)

    # UNSORTED points: the model-computed sortedness flag must route the
    # feature stages to the very same capped call -> bit-equal logits
    xu = jnp.asarray(rng.uniform(0, 30, (1, 640, 4)).astype(np.float32))
    cfg_off = dataclasses.replace(cfg, knn_band_feature=0)
    l1, _ = apply_dgcnn(params, state, xu, cfg, train=False)
    l0, _ = apply_dgcnn(params, state, xu, cfg_off, train=False)
    np.testing.assert_array_equal(np.asarray(l1), np.asarray(l0))

    # sorted input: runs the banded path; shape/finiteness sanity
    xs = np.asarray(xu).copy()
    xs[..., 0] = np.sort(xs[..., 0], axis=1)
    logits, _ = apply_dgcnn(params, state, jnp.asarray(xs), cfg,
                            train=False)
    assert logits.shape == (1, 640, 3)
    assert bool(jnp.all(jnp.isfinite(logits)))

    # small-n static route: banded wrapper routes to the identical capped
    # call -> bit-equal to the knob being off (sorted input, n_pad<=band)
    xsm = np.asarray(
        rng.uniform(0, 30, (1, 384, 4)).astype(np.float32))
    xsm[..., 0] = np.sort(xsm[..., 0], axis=1)
    xsm = jnp.asarray(xsm)
    l1, _ = apply_dgcnn(params, state, xsm, cfg, train=False)
    l0, _ = apply_dgcnn(params, state, xsm, cfg_off, train=False)
    np.testing.assert_array_equal(np.asarray(l1), np.asarray(l0))
