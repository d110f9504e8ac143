"""Name-based partial checkpoint loading: eval restore must work regardless
of the training-time optimizer's state structure."""

import os

import jax
import numpy as np
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


def test_restore_from_sharded_directory(tmp_path):
    """Multi-process-trained checkpoints (sharded DIRECTORY at
    '{label}.npz') must load through eval's _restore path."""
    import pytest

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 devices")
    from dgcnn_tpu.models.dgcnn import init_dgcnn
    from dgcnn_tpu.parallel.mesh import make_mesh, replicated_sharding
    from dgcnn_tpu.train.checkpoint import save_checkpoint_sharded
    from dgcnn_tpu.train.steps import init_train_state, make_optimizer
    from dgcnn_tpu.utils.logging import IOStream

    cfg = DGCNNConfig(num_classes=3, num_features=4, k=5, emb_dims=32,
                      knn_query_chunk=None)
    mesh = make_mesh(n_data=4, n_points=2)
    state = init_train_state(jax.random.key(2), cfg, make_optimizer())
    state = jax.device_put(state, replicated_sharding(mesh))
    root = tmp_path / "ckpt"
    root.mkdir()
    save_checkpoint_sharded(str(root / "dgcnn_model.npz"), state, epoch=5,
                            mBPCA=0.9)

    from dgcnn_tpu.eval.test import _restore

    io = IOStream(str(tmp_path / "log.txt"))
    params, bn = _restore(cfg, str(root), "dgcnn_model", io)
    for a, b in zip(jax.tree_util.tree_leaves(state.params),
                    jax.tree_util.tree_leaves(params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    for a, b in zip(jax.tree_util.tree_leaves(state.bn_state),
                    jax.tree_util.tree_leaves(bn)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_single_process_save_over_sharded_dir(tmp_path):
    """A single-process re-save onto a path occupied by a sharded
    directory must replace it, not crash in os.replace."""
    import pytest

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 devices")
    from dgcnn_tpu.parallel.mesh import make_mesh, replicated_sharding
    from dgcnn_tpu.train.checkpoint import (
        load_checkpoint,
        save_checkpoint,
        save_checkpoint_sharded,
    )
    from dgcnn_tpu.train.steps import init_train_state, make_optimizer

    cfg = DGCNNConfig(num_classes=3, num_features=4, k=5, emb_dims=32)
    mesh = make_mesh(n_data=4, n_points=2)
    state = init_train_state(jax.random.key(2), cfg, make_optimizer())
    state = jax.device_put(state, replicated_sharding(mesh))
    p = str(tmp_path / "m.npz")
    save_checkpoint_sharded(p, state, epoch=1)
    save_checkpoint(p, state, epoch=2)
    _, meta = load_checkpoint(p, state)
    assert meta["epoch"] == 2.0
