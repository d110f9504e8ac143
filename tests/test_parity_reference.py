"""Numerical parity vs the actual PyTorch reference implementation.

Loads /root/reference/model.py directly (skipped when the reference checkout
or torch is unavailable), patches the ``dim9=True`` crash at
/root/reference/model.py:147 (get_graph_feature takes no such kwarg — a
latent bug; the intended call drops it), converts the torch weights with
``dgcnn_tpu.compat`` and checks per-point probability drift is far inside
the ≤1e-3 budget (BASELINE.json north_star).
"""

import sys

import numpy as np
import pytest

from conftest import REFERENCE_DIR, has_reference, has_torch

pytestmark = pytest.mark.skipif(
    not (has_reference() and has_torch()),
    reason="reference checkout or torch unavailable",
)


@pytest.fixture(scope="module")
def reference_model():
    import torch

    sys.path.insert(0, REFERENCE_DIR)
    import model as ref_model  # /root/reference/model.py

    # patch the dim9 latent bug (SURVEY.md §2): forward() passes dim9=True
    # but get_graph_feature has no such parameter
    orig = ref_model.get_graph_feature

    def patched(x, k=20, use_cuda=True, **_ignored):
        return orig(x, k=k, use_cuda=use_cuda)

    ref_model.get_graph_feature = patched

    torch.manual_seed(0)
    m = ref_model.DGCNN(num_classes=5, num_features=4, k=12,
                        dropout=0.5, emb_dims=1024, cuda=False)
    m.eval()
    return m


def _convert(m):
    from dgcnn_tpu.compat.torch_ckpt import params_from_torch_state_dict

    return params_from_torch_state_dict(m.state_dict())


def test_eval_forward_parity(reference_model):
    import torch

    from dgcnn_tpu.models.dgcnn import DGCNNConfig, apply_dgcnn

    m = reference_model
    params, state = _convert(m)
    cfg = DGCNNConfig(num_classes=5, num_features=4, k=12, emb_dims=1024,
                      knn_query_chunk=None)

    rng = np.random.default_rng(7)
    # integer grid coordinates avoid kNN tie-order divergence between
    # torch.topk and lax.top_k on near-equal distances
    x = rng.integers(0, 50, (2, 4, 96)).astype(np.float32)
    x += rng.random((2, 4, 96)).astype(np.float32)  # jitter breaks exact ties

    with torch.no_grad():
        want = m(torch.from_numpy(x)).numpy()  # (B, C, N)

    got, _ = apply_dgcnn(params, state, np.transpose(x, (0, 2, 1)), cfg)
    got = np.transpose(np.asarray(got), (0, 2, 1))

    np.testing.assert_allclose(got, want, atol=2e-4, rtol=1e-3)

    # probability drift (the actual budget): softmax over classes
    def softmax(v, axis):
        e = np.exp(v - v.max(axis=axis, keepdims=True))
        return e / e.sum(axis=axis, keepdims=True)

    drift = np.abs(softmax(got, 1) - softmax(want, 1)).max()
    assert drift < 1e-3, f"per-point prob drift {drift}"


def test_depth_tap_parity(reference_model):
    """Per-stage activation taps match (depths 1-5) — localises any drift."""
    import torch

    from dgcnn_tpu.models.dgcnn import DGCNNConfig, apply_dgcnn

    m = reference_model
    params, state = _convert(m)
    cfg = DGCNNConfig(num_classes=5, num_features=4, k=12, emb_dims=1024,
                      knn_query_chunk=None)
    rng = np.random.default_rng(11)
    x = rng.integers(0, 40, (1, 4, 80)).astype(np.float32)
    x += rng.random((1, 4, 80)).astype(np.float32)

    for depth in (1, 2, 3, 4, 5):
        with torch.no_grad():
            want = m(torch.from_numpy(x), depth=depth).numpy()  # (B, C, N)
        got, _ = apply_dgcnn(params, state, np.transpose(x, (0, 2, 1)), cfg,
                             depth=depth)
        got = np.transpose(np.asarray(got), (0, 2, 1))
        np.testing.assert_allclose(
            got, want, atol=2e-4, rtol=1e-3,
            err_msg=f"depth {depth} activations diverge",
        )


def test_knn_parity_vs_torch(reference_model):
    """kNN neighbour sets match torch.topk on the same scores."""
    import torch

    sys.path.insert(0, REFERENCE_DIR)
    import model as ref_model

    from dgcnn_tpu.ops.knn import knn

    rng = np.random.default_rng(3)
    x = rng.integers(0, 30, (2, 3, 64)).astype(np.float32)
    x += rng.random((2, 3, 64)).astype(np.float32)
    with torch.no_grad():
        want = ref_model.knn(torch.from_numpy(x), 9).numpy()
    got = np.asarray(knn(np.transpose(x, (0, 2, 1)), 9, query_chunk=None))
    # compare as sets per point (tie order may legally differ)
    np.testing.assert_array_equal(np.sort(got, -1), np.sort(want, -1))
