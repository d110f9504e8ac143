"""f32-exact banded/windowed kNN (kernels/knn_pallas.py::knn_pallas_exact).

The exact kernel claims BIT-IDENTICAL indices to ``lax.top_k`` over the
reference scores on EVERY input (certified + repaired, no quantization),
so unlike the packed/banded tests these use full-precision random floats
— any selection or tie-order deviation fails hard.
"""

import dataclasses

import jax.numpy as jnp
import numpy as np
import pytest

from dgcnn_tpu.kernels.knn_pallas import knn_pallas, knn_pallas_exact
from dgcnn_tpu.ops.knn import knn

EXACT = dict(band=512, n_win=16, cap=8, query_tile=128, interpret=True)


def sorted_float_cloud(rng, b, n, c, spans=(30.0, 4.0, 4.0, 4.0)):
    """x-sorted cloud with fractional float coordinates on a 1/64 grid.

    Unlike the banded PACKED tests' integer coords (which sidestep the
    kernel's key quantization — the exact kernel has none), the grid here
    pins down the MATMUL: coords are m * 2^-6 with m < 2^11, so every
    q.c dot term and partial sum is exactly representable in f32 and the
    kernel's tiled dot is bit-identical to ops/knn.py's einsum in ANY
    accumulation order. With free-form floats the two differently-shaped
    XLA programs disagree by 1 ulp on ~4e-5 of scores under XLA-CPU,
    flipping exact near-ties — true of the pre-existing flat f32 kernel
    too (measured: 1/25600 queries), and not observed on real TPU. The
    scores themselves still round (the 2qc - |c|^2 subtraction), so the
    full f32 key/tie path is exercised — ties are in fact ABUNDANT on
    the grid."""
    cols = [rng.uniform(0, spans[min(j, len(spans) - 1)], (b, n))
            for j in range(c)]
    x = np.stack(cols, axis=-1).astype(np.float32)
    x = np.round(x * 64.0) / 64.0
    order = np.argsort(x[..., 0], axis=1, kind="stable")
    return jnp.asarray(np.take_along_axis(x, order[..., None], axis=1))


def test_exact_matches_top_k_on_sorted(rng):
    x = sorted_float_cloud(rng, 2, 1600, 4)
    want = np.asarray(knn(x, 8, query_chunk=None))
    got = np.asarray(knn_pallas_exact(x, 8, **EXACT))
    np.testing.assert_array_equal(got, want)


def test_exact_unaligned_n_and_k(rng):
    x = sorted_float_cloud(rng, 1, 1111, 3)
    want = np.asarray(knn(x, 7, query_chunk=None))
    got = np.asarray(knn_pallas_exact(x, 7, **EXACT))
    np.testing.assert_array_equal(got, want)


def test_exact_unsorted_runs_full_width(rng):
    # unsorted input: no band bound exists — the full-width windowed path
    # (overflow certificate only) must still be exact
    x = rng.uniform(0, 30, (2, 1600, 4)).astype(np.float32)
    x = jnp.asarray(np.round(x * 64.0) / 64.0)  # dot-exact grid, see above
    want = np.asarray(knn(x, 8, query_chunk=None))
    got = np.asarray(knn_pallas_exact(x, 8, **EXACT))
    np.testing.assert_array_equal(got, want)


def test_exact_band_zero_forces_full_width(rng):
    # band=0 (the feature-space stages): full-width windowed scan,
    # exact on sorted and unsorted input alike
    x = sorted_float_cloud(rng, 1, 1600, 4)
    want = np.asarray(knn(x, 8, query_chunk=None))
    got = np.asarray(knn_pallas_exact(x, 8, **{**EXACT, "band": 0}))
    np.testing.assert_array_equal(got, want)


def test_exact_tie_order_matches_top_k(rng):
    # heavy duplicate coordinates: exact score ties everywhere; order
    # must match lax.top_k's lower-index-first
    base = rng.integers(0, 6, (1, 800, 4)).astype(np.float32)
    base[..., 0] = np.sort(base[..., 0], axis=1)
    x = jnp.asarray(base)
    want = np.asarray(knn(x, 6, query_chunk=None))
    got = np.asarray(knn_pallas_exact(x, 6, **EXACT))
    np.testing.assert_array_equal(got, want)


def test_exact_sparse_rows_repaired(rng):
    # rows with a huge y offset: true neighbours are the other offset
    # rows far outside any x band -> band-edge certificate fails them
    # and the repair restores the exact answer
    xs = sorted_float_cloud(rng, 1, 1600, 4)
    x = np.asarray(xs).copy()
    sparse = np.linspace(50, 1500, 12, dtype=int)
    x[0, sparse, 1] += 500.0
    x = jnp.asarray(x)
    want = np.asarray(knn(x, 8, query_chunk=None))
    got = np.asarray(knn_pallas_exact(x, 8, **EXACT))
    np.testing.assert_array_equal(got, want)


def test_exact_window_overflow_repaired(rng):
    # adversarial residue-class cluster: a subset of rows r = 3 (mod
    # n_win) gets y=0 while everything else sits at y=100, so those
    # queries' ENTIRE top-k lives in one extraction window — more than
    # cap=4 deep. The kernel's overflow certificate must flag them and
    # the repair must restore exactness.
    n, n_win = 1600, 16
    x = np.zeros((1, n, 3), np.float32)
    x[0, :, 0] = np.arange(n) * 1e-3          # sorted, tightly spaced
    x[0, :, 1] = 100.0
    x[0, 3::n_win, 1] = 0.0
    x = jnp.asarray(x)
    want = np.asarray(knn(x, 8, query_chunk=None))
    got = np.asarray(knn_pallas_exact(
        x, 8, band=512, n_win=n_win, cap=4, query_tile=128,
        interpret=True))
    np.testing.assert_array_equal(got, want)


def test_exact_budget_overflow_falls_back_flat(rng):
    # all x equal -> every band-edge certificate fails -> budget
    # overflow -> flat f32-exact kernel; still exact
    x = np.asarray(sorted_float_cloud(rng, 1, 1600, 4)).copy()
    x[..., 0] = 1.0
    x = jnp.asarray(x)
    want = np.asarray(knn(x, 8, query_chunk=None))
    got = np.asarray(knn_pallas_exact(x, 8, repair_budget=64, **EXACT))
    np.testing.assert_array_equal(got, want)


def test_exact_small_input_uses_flat(rng):
    x = sorted_float_cloud(rng, 1, 24, 4)
    want = np.asarray(knn(x, 8, query_chunk=None))
    got = np.asarray(knn_pallas_exact(x, 8, **EXACT))
    np.testing.assert_array_equal(got, want)


def test_exact_fori_variant(rng):
    x = sorted_float_cloud(rng, 1, 1600, 4)
    want = np.asarray(knn_pallas_exact(x, 8, **EXACT))
    got = np.asarray(knn_pallas_exact(
        x, 8, **{**EXACT, "unroll_cap": 1, "unroll_merge": 1}))
    np.testing.assert_array_equal(got, want)


def test_exact_band_narrower_than_query_tile(rng, monkeypatch):
    # band < query_tile: without the qt=min(qt, band) clamp the tile-edge
    # queries sit outside their own band, the edge certificate fails them
    # all, and every call silently runs the flat fallback on top of the
    # banded pass (banding inert). Spy on the banded kernel call to pin
    # the clamp, and check exactness end-to-end.
    import dgcnn_tpu.kernels.knn_pallas as kp

    calls = []
    real = kp._knn_exact_jit

    def spy(x, k, **kw):
        calls.append(dict(kw))
        return real(x, k, **kw)

    monkeypatch.setattr(kp, "_knn_exact_jit", spy)
    x = sorted_float_cloud(rng, 1, 1600, 4)
    want = np.asarray(knn(x, 8, query_chunk=None))
    got = np.asarray(kp.knn_pallas_exact(
        x, 8, band=256, n_win=16, cap=8, query_tile=512, interpret=True))
    np.testing.assert_array_equal(got, want)
    banded = [c for c in calls if c["band"] == 256]
    assert banded and all(c["query_tile"] <= 256 for c in banded)


def test_exact_validation():
    x = jnp.zeros((1, 1600, 4))
    with pytest.raises(ValueError, match="band"):
        knn_pallas_exact(x, 8, band=500, interpret=True)
    with pytest.raises(ValueError, match="capacity"):
        knn_pallas_exact(x, 8, band=512, n_win=2, cap=3, interpret=True)
    with pytest.raises(ValueError, match="exceeds"):
        knn_pallas_exact(jnp.zeros((1, 4, 3)), 8, interpret=True)


def test_model_pallas_impl_is_exact(rng):
    """knn_impl='pallas' (the parity mode) now routes through the exact
    banded/windowed kernel — model logits must be BIT-equal to the XLA
    top_k path on the same input."""
    import jax

    from dgcnn_tpu.models.dgcnn import DGCNNConfig, apply_dgcnn, init_dgcnn

    cfg = DGCNNConfig(num_classes=3, num_features=4, k=6, emb_dims=64,
                      knn_impl="pallas", knn_band=512, fuse_epilogue=False)
    params, state = init_dgcnn(jax.random.key(0), cfg)
    x = sorted_float_cloud(rng, 1, 640, 4)
    l_exact, _ = apply_dgcnn(params, state, x, cfg, train=False)
    cfg_xla = dataclasses.replace(cfg, knn_impl="xla")
    l_xla, _ = apply_dgcnn(params, state, x, cfg_xla, train=False)
    np.testing.assert_array_equal(np.asarray(l_exact), np.asarray(l_xla))
