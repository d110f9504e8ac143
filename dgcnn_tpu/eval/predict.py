"""Whole-cloud prediction: LAS in → classified LAS out.

The production inference path (/root/reference/test.py:223-332): load and
noise-filter the cloud, compute DTM + AGL, tile into 30 m blocks of
``num_points``, run the model per block with confidence thresholding, merge
predictions and write LAS. TPU redesign: blocks are *batched* into fixed
(B, N, F) tensors (the reference runs one block at a time) and the whole
batch loop is one jitted program; per-block debug dumps (data{n}.txt,
pc_pred_{n}.las) are opt-in instead of always-on.
"""

from __future__ import annotations


import numpy as np

from dgcnn_tpu.io.las import save_las_pointcloud
from dgcnn_tpu.models.dgcnn import DGCNNConfig
from dgcnn_tpu.prepare.blocks import room2blocks
from dgcnn_tpu.prepare.dtm import build_dtm, gen_agl
from dgcnn_tpu.prepare.loaders import load_pointcloud
from dgcnn_tpu.eval.test import _restore
from dgcnn_tpu.train.steps import make_predict_step
from dgcnn_tpu.utils.logging import IOStream

UNCLASSIFIED = 31


def predict(
    k: int,
    io: IOStream,
    pointcloud_file: str,
    pred_pointcloud_file: str,
    num_points: int = 7000,
    block_size: float = 30.0,
    num_classes: int = 5,
    num_features: int = 4,
    dropout: float = 0.5,
    emb_dims: int = 1024,
    min_class_confidence: float = 0.8,
    model_label: str = "dgcnn_model",
    model_root: str = "checkpoints/dgcnn",
    batch_size: int = 8,
    knn_impl: str = "auto",
    compute_dtype: str | None = None,
    matmul_precision: str | None = None,
    save_block_las: bool = False,
    features: dict[str, int] | None = None,
    features_output: list[str] | None = None,
    dtm_kwargs: dict | None = None,
    seed: int = 0,
    classify_all: bool = False,
) -> tuple[np.ndarray, np.ndarray]:
    """Classify a LAS/HDF5 point cloud end to end.

    Returns (data (M, F), predictions (M,)) over all tiled blocks and
    writes the merged classified LAS to ``pred_pointcloud_file``.

    ``classify_all=False`` reproduces the reference behaviour
    (/root/reference/test.py:281-285): each 30 m block is randomly
    subsampled to ``num_points``, so only those points appear in the
    output. ``classify_all=True`` instead partitions every block's full
    point set into fixed-size chunks (last chunk padded by repetition) so
    EVERY input point inside a populated block gets a label — same cost
    per point, no dropped points.
    """
    cfg = DGCNNConfig(
        num_classes=num_classes, num_features=num_features, k=k,
        dropout=dropout, emb_dims=emb_dims, knn_impl=knn_impl,
        compute_dtype=compute_dtype, matmul_precision=matmul_precision,
    )
    params, bn_state = _restore(cfg, model_root, model_label, io)
    predict_step = make_predict_step(
        cfg, min_class_confidence=min_class_confidence,
        unclassified=UNCLASSIFIED,
    )

    features = features or {"x": 0, "y": 1, "z": 2, "agl": 3}
    features_output = features_output or list(features)
    data, labels = load_pointcloud(
        pointcloud_file, features_output=features_output, features=features
    )
    io.cprint(f"loaded {len(data)} points from {pointcloud_file}")
    if len(data) == 0:  # e.g. the noise filter removed everything
        io.cprint("empty cloud — nothing to classify")
        return np.zeros((0, data.shape[1])), np.zeros((0,), np.int32)

    dtm = build_dtm(data[:, :3], **(dtm_kwargs or {}))
    agl = gen_agl(dtm, data[:, :3])
    fcols = {k_.lower(): v for k_, v in features.items()}
    if "agl" in fcols and fcols["agl"] < data.shape[1]:
        data[:, fcols["agl"]] = agl
    else:
        data = np.hstack([data, agl[:, None]])

    rng = np.random.default_rng(seed)
    if classify_all:
        ragged, _ = room2blocks(
            data, labels, num_points, block_size=block_size,
            stride=block_size, random_sample=False, use_all_points=True,
            rng=rng,
        )
        chunks, chunk_valid = [], []
        for block in ragged:
            order = rng.permutation(len(block))
            for start in range(0, len(block), num_points):
                sel = order[start : start + num_points]
                n_real = len(sel)
                valid = np.zeros(num_points, bool)
                valid[:n_real] = True
                if n_real < num_points:  # pad by repeating earlier points
                    pad = rng.choice(order, num_points - n_real)
                    sel = np.concatenate([sel, pad])
                # x-sort the chunk (order is semantically free; sorted
                # rows make the neighbour gathers spatially local —
                # see FugroDataset.sort_points); valid mask rides along
                perm = np.argsort(block[sel, 0], kind="stable")
                chunks.append(block[sel[perm]])
                chunk_valid.append(valid[perm])
        block_data = (
            np.stack(chunks) if chunks
            else np.zeros((0, num_points, data.shape[1]))
        )
    else:
        chunk_valid = None
        block_data, _ = room2blocks(
            data, labels, num_points, block_size=block_size,
            stride=block_size, random_sample=False, use_all_points=False,
            rng=rng,
        )
        if len(block_data):
            # x-sort each block's rows (see FugroDataset.sort_points)
            block_data = np.stack([
                blk[np.argsort(blk[:, 0], kind="stable")]
                for blk in block_data
            ])
    n_blocks = len(block_data)
    io.cprint(f"classifying {n_blocks} blocks of {num_points} points")
    if n_blocks == 0:
        io.cprint("no blocks with enough points — nothing to classify")
        return np.zeros((0, data.shape[1])), np.zeros((0,), np.int32)

    # shift every block to its local XY origin (test.py:298-301), batch them
    shifts = np.zeros((n_blocks, data.shape[1]))
    blocks = block_data.astype(np.float32).copy()
    for i in range(n_blocks):
        shifts[i, 0] = blocks[i, :, 0].min()
        shifts[i, 1] = blocks[i, :, 1].min()
        blocks[i, :, 0] -= shifts[i, 0]
        blocks[i, :, 1] -= shifts[i, 1]

    # dispatch batches asynchronously (JAX queues device work; pulling each
    # result immediately would serialise host<->device) but bound the
    # in-flight window: without a periodic sync, every batch's input buffer
    # stays resident on the device until the queue drains — unbounded
    # growth on very large tiles
    window = 8
    all_pred = np.zeros((n_blocks, num_points), np.int32)
    in_flight: list[tuple[int, object, int]] = []

    def _drain_one():
        bi, pred, nreal = in_flight.pop(0)
        start = bi * batch_size
        all_pred[start : start + batch_size] = np.asarray(pred)[:nreal]

    for bi, start in enumerate(range(0, n_blocks, batch_size)):
        chunk = blocks[start : start + batch_size]
        pad = batch_size - len(chunk)
        if pad:
            chunk = np.concatenate([chunk, np.repeat(chunk[-1:], pad, 0)])
        pred, _, _ = predict_step(params, bn_state, chunk[:, :, :num_features])
        in_flight.append((bi, pred, batch_size - pad))
        if len(in_flight) > window:
            _drain_one()
    while in_flight:
        _drain_one()

    merged_pts = []
    merged_pred = []
    for i in range(n_blocks):
        keep = chunk_valid[i] if chunk_valid is not None else slice(None)
        pts = block_data[i][keep].astype(np.float64)
        merged_pts.append(pts)
        merged_pred.append(all_pred[i][keep])
        if save_block_las:
            save_las_pointcloud(
                pts, all_pred[i][keep], f"pc_pred_{i + 1}.las",
                features_output=features_output, features=features,
            )
    out_data = np.vstack(merged_pts)
    out_pred = np.concatenate(merged_pred)
    save_las_pointcloud(
        out_data, np.where(out_pred == UNCLASSIFIED, UNCLASSIFIED, out_pred),
        pred_pointcloud_file,
        features_output=features_output, features=features,
    )
    io.cprint(f"wrote {pred_pointcloud_file} ({len(out_data)} points)")
    return out_data, out_pred
