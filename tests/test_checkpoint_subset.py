"""Name-based partial checkpoint loading: eval restore must work regardless
of the training-time optimizer's state structure."""

import os

import jax
import pytest

from dgcnn_tpu.eval.test import _restore
from dgcnn_tpu.models.dgcnn import DGCNNConfig, init_dgcnn
from dgcnn_tpu.train.checkpoint import load_named_subtrees, save_checkpoint
from dgcnn_tpu.train.steps import init_train_state, make_optimizer
from dgcnn_tpu.utils.logging import IOStream

CFG = DGCNNConfig(num_classes=3, num_features=4, k=5, emb_dims=16,
                  knn_query_chunk=None)


@pytest.mark.parametrize("use_sgd", [False, True])
def test_eval_restore_any_optimizer(tmp_path, use_sgd):
    tx = make_optimizer(use_sgd=use_sgd)
    state = init_train_state(jax.random.key(0), CFG, tx)
    save_checkpoint(str(tmp_path / "m.npz"), state, epoch=3, mBPCA=0.7)
    io = IOStream(str(tmp_path / "log.txt"))
    params, bn_state = _restore(CFG, str(tmp_path), "m", io)
    import numpy as np

    for a, b in zip(jax.tree_util.tree_leaves(params),
                    jax.tree_util.tree_leaves(state.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_load_named_subtrees_missing_leaf(tmp_path):
    tx = make_optimizer()
    state = init_train_state(jax.random.key(0), CFG, tx)
    save_checkpoint(str(tmp_path / "m.npz"), state, epoch=0, mBPCA=0.0)
    other = DGCNNConfig(num_classes=3, num_features=4, k=5, emb_dims=32,
                        knn_query_chunk=None)
    p_tpl, _ = init_dgcnn(jax.random.key(0), other)
    with pytest.raises((KeyError, ValueError)):
        load_named_subtrees(str(tmp_path / "m.npz"), {"params": p_tpl})


def test_restore_missing_file_raises(tmp_path):
    io = IOStream(str(tmp_path / "log.txt"))
    with pytest.raises(FileNotFoundError):
        _restore(CFG, str(tmp_path), "nope", io)
