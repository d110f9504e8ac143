"""Small-surface coverage: profiler trace, single-process distributed init,
viz depth sweep, predict with too-sparse clouds."""

import os

import jax
import numpy as np
import pytest


def test_trace_writes_profile(tmp_path):
    from dgcnn_tpu.utils.profiling import trace

    with trace(str(tmp_path)):
        _ = jax.numpy.sum(jax.numpy.ones((64, 64))).block_until_ready()
    # jax.profiler writes a plugins/profile tree
    found = []
    for root, _, files in os.walk(tmp_path):
        found += files
    assert found, "no trace artifacts written"


def test_distributed_single_process():
    from dgcnn_tpu.parallel.distributed import (
        global_batch_parts,
        initialize,
    )

    info = initialize()
    assert info["process_count"] == 1 and info["process_index"] == 0
    per, off = global_batch_parts(16)
    assert (per, off) == (16, 0)


def test_viz_all_layers_smoke(tmp_path, rng):
    from dgcnn_tpu.models.dgcnn import DGCNNConfig, init_dgcnn
    from dgcnn_tpu.viz.features import feature_tsne

    cfg = DGCNNConfig(num_classes=3, num_features=4, k=5, emb_dims=16,
                      knn_query_chunk=None)
    params, state = init_dgcnn(jax.random.key(0), cfg)
    block = rng.random((60, 4)).astype(np.float32) * 10
    # depth 6 is the global-vector tap — exercises the per-point broadcast
    paths = feature_tsne(params, state, cfg, [block], depth=6,
                         out_dir=str(tmp_path), perplexity=8, max_points=50)
    assert paths and os.path.exists(paths[0])


def test_predict_sparse_cloud(tmp_path, rng):
    """Clouds where no block reaches the minimum point count produce an
    empty result without writing a broken LAS."""
    from dgcnn_tpu.eval.predict import predict
    from dgcnn_tpu.io.las import write_las
    from dgcnn_tpu.models.dgcnn import DGCNNConfig
    from dgcnn_tpu.train.checkpoint import save_checkpoint
    from dgcnn_tpu.train.steps import init_train_state, make_optimizer
    from dgcnn_tpu.utils.logging import IOStream

    n = 200  # < 1000-per-block minimum
    write_las(str(tmp_path / "sparse.las"),
              rng.random(n) * 5, rng.random(n) * 5, rng.random(n),
              np.zeros(n))
    cfg = DGCNNConfig(num_classes=3, num_features=4, k=5, emb_dims=16)
    tx = make_optimizer()
    state = init_train_state(jax.random.key(0), cfg, tx)
    save_checkpoint(str(tmp_path / "m.npz"), state, epoch=0, mBPCA=0.0)
    io = IOStream(str(tmp_path / "log.txt"))
    data, preds = predict(
        5, io, str(tmp_path / "sparse.las"), str(tmp_path / "out.las"),
        num_points=64, block_size=20.0, num_classes=3, num_features=4,
        emb_dims=16, model_label="m", model_root=str(tmp_path),
    )
    assert len(data) == 0 and len(preds) == 0
