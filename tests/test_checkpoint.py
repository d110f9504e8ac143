"""Checkpoint tests: round-trip fidelity (incl. PRNG keys and optimizer
state), best-only policy semantics, resume behaviour, corrupt-file fallback
(/root/reference/train.py:127-138, :301-312)."""

import jax
import jax.numpy as jnp
import numpy as np

from dgcnn_tpu.models.dgcnn import DGCNNConfig
from dgcnn_tpu.train.checkpoint import (
    load_checkpoint,
    save_checkpoint,
    try_resume,
)
from dgcnn_tpu.train.steps import init_train_state, make_optimizer

CFG = DGCNNConfig(num_classes=3, num_features=4, k=5, emb_dims=32,
                  knn_query_chunk=None)


def _state():
    tx = make_optimizer()
    return init_train_state(jax.random.key(7), CFG, tx), tx


def test_round_trip_full_train_state(tmp_path):
    state, _ = _state()
    path = str(tmp_path / "ck.npz")
    save_checkpoint(path, state, epoch=4, mBPCA=0.87)
    restored, meta = load_checkpoint(path, state)
    assert meta == {"epoch": 4.0, "mBPCA": 0.87}
    for a, b in zip(jax.tree_util.tree_leaves(state.params),
                    jax.tree_util.tree_leaves(restored.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # PRNG key survives and is usable
    k1 = jax.random.normal(state.rng, (3,))
    k2 = jax.random.normal(restored.rng, (3,))
    np.testing.assert_array_equal(np.asarray(k1), np.asarray(k2))
    assert int(restored.step) == int(state.step)


def test_try_resume_missing(tmp_path):
    state, _ = _state()
    assert try_resume(str(tmp_path / "nope.npz"), state) is None


def test_try_resume_corrupt(tmp_path):
    state, _ = _state()
    p = tmp_path / "bad.npz"
    p.write_bytes(b"not an npz at all")
    assert try_resume(str(p), state) is None


def test_structural_mismatch_rejected(tmp_path):
    state, _ = _state()
    path = str(tmp_path / "ck.npz")
    save_checkpoint(path, state, epoch=0, mBPCA=0.0)
    other_cfg = DGCNNConfig(num_classes=4, num_features=4, k=5, emb_dims=32)
    other, _ = (init_train_state(jax.random.key(0), other_cfg,
                                 make_optimizer()), None)
    assert try_resume(path, other) is None  # shape mismatch -> fresh start


def test_atomic_overwrite(tmp_path):
    state, _ = _state()
    path = str(tmp_path / "ck.npz")
    save_checkpoint(path, state, epoch=0, mBPCA=0.1)
    save_checkpoint(path, state, epoch=1, mBPCA=0.2)
    _, meta = load_checkpoint(path, state)
    assert meta["epoch"] == 1.0
