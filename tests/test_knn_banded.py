"""Banded stage-1 kNN (kernels/knn_pallas.py::knn_pallas_banded).

Interpret-mode tests of the band + certificate + exact-repair pipeline.
With ``cap >= k`` no in-band window overflow is possible, so certified
rows equal the exact top-k over the band and the certificate guarantees
band == full — every test below can therefore demand EXACT agreement
with the XLA reference (ops/knn.py), including the engineered-failure
cases that exercise the repair and fallback paths.
"""

import dataclasses

import jax.numpy as jnp
import numpy as np
import pytest

from dgcnn_tpu.kernels.knn_pallas import knn_pallas, knn_pallas_banded
from dgcnn_tpu.ops.knn import knn

BANDED = dict(band=512, n_win=16, cap=8, query_tile=128, interpret=True)


def sorted_cloud(rng, b, n, c, spans=(30, 4, 4, 4)):
    """x-sorted integer-coordinate cloud. Integer coords keep every
    distinct small d^2 distinct under the kernels' truncated packed keys
    (ints < 2^13 are exactly representable in the kept mantissa bits), so
    quantization ties coincide with EXACT ties and banded/capped output
    can be compared bit-for-bit against lax.top_k. The narrow y/z/f spans
    make neighbourhoods spatially local (d_k << band span), like the
    LiDAR blocks the banded kernel exists for."""
    cols = [rng.integers(0, spans[min(j, len(spans) - 1)] + 1, (b, n))
            for j in range(c)]
    x = np.stack(cols, axis=-1).astype(np.float32)
    order = np.argsort(x[..., 0], axis=1, kind="stable")
    return jnp.asarray(np.take_along_axis(x, order[..., None], axis=1))


def test_banded_matches_exact_on_sorted(rng):
    x = sorted_cloud(rng, 2, 1600, 4)
    want = np.asarray(knn(x, 8, query_chunk=None))
    got = np.asarray(knn_pallas_banded(x, 8, **BANDED))
    np.testing.assert_array_equal(got, want)


def test_banded_unaligned_n_and_k(rng):
    x = sorted_cloud(rng, 1, 1111, 3)
    want = np.asarray(knn(x, 7, query_chunk=None))
    got = np.asarray(knn_pallas_banded(x, 7, **BANDED))
    np.testing.assert_array_equal(got, want)


def test_banded_repair_fixes_sparse_rows(rng):
    # a few rows get a huge y offset: their true neighbours are the OTHER
    # offset rows, far outside any x band -> certificate must fail them
    # and the f32-exact repair must restore the exact answer
    xs = sorted_cloud(rng, 1, 1600, 4)
    x = np.asarray(xs).copy()
    sparse = np.linspace(50, 1500, 12, dtype=int)
    x[0, sparse, 1] += 500.0
    x = jnp.asarray(x)
    want = np.asarray(knn(x, 8, query_chunk=None))
    got = np.asarray(knn_pallas_banded(x, 8, **BANDED))
    np.testing.assert_array_equal(got, want)


def test_banded_unsorted_falls_back_to_capped(rng):
    x = jnp.asarray(rng.uniform(0, 30, (1, 1600, 4)).astype(np.float32))
    # deliberately NOT sorted: the runtime guard must route to the full
    # capped kernel (identical call parameters)
    want = np.asarray(knn_pallas(x, 8, packed=True, cap=8, unroll_cap=0,
                                 interpret=True))
    got = np.asarray(knn_pallas_banded(x, 8, **BANDED))
    np.testing.assert_array_equal(got, want)


def test_banded_budget_overflow_falls_back(rng):
    # all x equal: every band edge is at distance 0, every certificate
    # fails, the repair budget overflows -> full capped kernel result
    x = np.asarray(sorted_cloud(rng, 1, 1600, 4)).copy()
    x[..., 0] = 1.0
    x = jnp.asarray(x)
    want = np.asarray(knn_pallas(x, 8, packed=True, cap=8, unroll_cap=0,
                                 interpret=True))
    got = np.asarray(knn_pallas_banded(x, 8, repair_budget=64, **BANDED))
    np.testing.assert_array_equal(got, want)


def test_banded_small_input_uses_capped(rng):
    # n_pad <= band: banding is a no-op, the wrapper must route to capped
    x = sorted_cloud(rng, 1, 300, 4)
    want = np.asarray(knn_pallas(x, 8, packed=True, cap=8, unroll_cap=0,
                                 interpret=True))
    got = np.asarray(knn_pallas_banded(x, 8, **BANDED))
    np.testing.assert_array_equal(got, want)


def test_banded_tie_order_matches_top_k(rng):
    base = rng.integers(0, 6, (1, 800, 4)).astype(np.float32)
    base[..., 0] = np.sort(base[..., 0], axis=1)  # heavy duplicate ties
    x = jnp.asarray(base)
    want = np.asarray(knn(x, 6, query_chunk=None))
    got = np.asarray(knn_pallas_banded(x, 6, **BANDED))
    np.testing.assert_array_equal(got, want)


def test_banded_fori_variant(rng):
    x = sorted_cloud(rng, 1, 1600, 4)
    want = np.asarray(knn_pallas_banded(x, 8, **BANDED))
    got = np.asarray(knn_pallas_banded(
        x, 8, **{**BANDED, "unroll_cap": 1, "unroll_merge": 1}))
    np.testing.assert_array_equal(got, want)


def test_banded_validation():
    x = jnp.zeros((1, 1600, 4))
    with pytest.raises(ValueError, match="band"):
        knn_pallas_banded(x, 8, band=500, interpret=True)
    with pytest.raises(ValueError, match="capacity"):
        knn_pallas_banded(x, 8, band=512, n_win=2, cap=3, interpret=True)
    with pytest.raises(ValueError, match="exceeds"):
        knn_pallas_banded(jnp.zeros((1, 4, 3)), 8, interpret=True)


def test_queries_variant_matches_bruteforce(rng):
    x = jnp.asarray(rng.standard_normal((2, 300, 5)).astype(np.float32))
    q = jnp.asarray(rng.standard_normal((2, 40, 5)).astype(np.float32))
    got = np.asarray(knn_pallas(x, 6, queries=q, query_tile=64,
                                interpret=True))
    xs = np.asarray(x)
    qs = np.asarray(q)
    d = ((qs[:, :, None, :] - xs[:, None, :, :]) ** 2).sum(-1)
    for b in range(2):
        for i in range(40):
            order = np.argsort(d[b, i], kind="stable")[:6]
            np.testing.assert_array_equal(got[b, i], order)


def test_model_config_knob(rng):
    from dgcnn_tpu.models.dgcnn import DGCNNConfig, apply_dgcnn, init_dgcnn
    import jax

    with pytest.raises(ValueError, match="knn_band"):
        DGCNNConfig(knn_band=100)
    cfg = DGCNNConfig(num_classes=3, num_features=4, k=6, emb_dims=64,
                      knn_impl="pallas_capped", knn_band=512)
    params, state = init_dgcnn(jax.random.key(0), cfg)
    x = sorted_cloud(rng, 1, 640, 4)
    logits, _ = apply_dgcnn(params, state, x, cfg, train=False)
    assert logits.shape == (1, 640, 3)
    assert bool(jnp.all(jnp.isfinite(logits)))
    # wiring check without quantization flakiness: with n_pad <= band the
    # banded wrapper routes to the identical capped call, so the model
    # must produce BIT-equal logits to knn_band=0
    xs = sorted_cloud(rng, 1, 384, 4)
    cfg_small = dataclasses.replace(cfg, knn_band=512)
    cfg_off = dataclasses.replace(cfg, knn_band=0)
    l1, _ = apply_dgcnn(params, state, xs, cfg_small, train=False)
    l0, _ = apply_dgcnn(params, state, xs, cfg_off, train=False)
    np.testing.assert_array_equal(np.asarray(l1), np.asarray(l0))


def test_study_ablation_variants_run(rng):
    """The `study` instrumentation kwarg (scripts/exp_knn_floor.py) must
    keep compiling in every mode and must not perturb the production
    (study=None) output. Study outputs are junk by contract — only shape
    and dtype are asserted."""
    from dgcnn_tpu.kernels.knn_pallas import _knn_banded_jit

    x = sorted_cloud(rng, 2, 600, 8)
    kw = dict(band=256, n_win=8, cap=4, query_tile=128, interpret=True)
    idx0, keys0 = _knn_banded_jit(x, 6, **kw)
    idxn, keysn = _knn_banded_jit(x, 6, study=None, **kw)
    np.testing.assert_array_equal(np.asarray(idx0), np.asarray(idxn))
    np.testing.assert_array_equal(np.asarray(keys0), np.asarray(keysn))
    for mode in ("score_only", "no_extract", "no_mm", "bf16_mm"):
        idx, keys = _knn_banded_jit(x, 6, study=mode, **kw)
        assert idx.shape == (2, 600, 6) and idx.dtype == jnp.int32, mode
        assert keys.shape == (2, 600) and keys.dtype == jnp.int32, mode
