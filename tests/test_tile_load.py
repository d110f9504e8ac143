"""Fused native tile load (prepare/tile_load.py + dtmgen_tile_load):
byte-equality against the separate-stage Python chain it replaces.

Reference chain being fused: load + noise
(/root/reference/prepare_data/process_data.py:96-123), DTM + AGL
(/root/reference/prepare_data/dtm.py:22-160), blocking
(/root/reference/prepare_data/pointcloud_util.py:97-192).
"""

import os

import numpy as np
import pytest

from dgcnn_tpu.io.las import write_las
from dgcnn_tpu.prepare.blocks import (
    MIN_BLOCK_POINTS,
    room2blocks,
    sample_data,
)
from dgcnn_tpu.prepare.dtm import build_dtm, gen_agl
from dgcnn_tpu.prepare.loaders import load_pointcloud
from dgcnn_tpu.prepare.tile_load import load_tile_las

FEATS = {"x": 0, "y": 1, "z": 2, "agl": 3}


def _scene(rng, n=40_000, extent=70.0):
    xy = rng.random((n, 2)) * extent
    z = 0.03 * xy[:, 0] + rng.normal(0, 0.1, n)
    veg = rng.random(n) < 0.3
    z[veg] += rng.random(int(veg.sum())) * 6 + 0.5
    # a handful of isolated points for the noise filter to remove
    xy[:4] += extent * 4
    cls = np.where(veg, 5, 2).astype(np.int64)
    return xy, z, cls


@pytest.fixture(scope="module")
def tile(tmp_path_factory):
    rng = np.random.default_rng(3)
    xy, z, cls = _scene(rng)
    path = str(tmp_path_factory.mktemp("tl") / "tile.las")
    write_las(path, xy[:, 0] + 5e5, xy[:, 1] + 6e6, z, cls)
    return path


@pytest.fixture(scope="module")
def fused(tile):
    tl = load_tile_las(tile, FEATS, list(FEATS))
    if tl is None:
        pytest.skip("native dtmgen_tile_load unavailable")
    return tl


@pytest.fixture(scope="module")
def chain(tile):
    data, labels = load_pointcloud(
        tile, features_output=list(FEATS), features=FEATS)
    return data, labels


def test_data_and_labels_byte_equal(fused, chain):
    data, labels = chain
    assert np.array_equal(fused.labels, labels)
    # every column except AGL byte-equal (the chain leaves AGL zero at
    # this stage; the fused call fills it)
    for name, col in FEATS.items():
        if name == "agl":
            continue
        assert np.array_equal(fused.data[:, col], data[:, col]), name
    # both chains dropped the same points (the 4 planted outliers plus
    # whatever else the 1 m rule removes at this density)
    assert fused.dropped >= 4
    assert len(fused.data) == len(data)


def test_dtm_grid_byte_equal(fused, chain):
    data, _ = chain
    dtm_pts = build_dtm(data[:, :3])
    edge = fused.dtm_grid.shape[0]
    xs = fused.geo[0] + np.arange(edge) * 1.0
    ys = fused.geo[1] + np.arange(edge) * 1.0
    gx, gy = np.meshgrid(xs, ys, indexing="ij")
    pts = np.stack([gx.ravel(), gy.ravel(), fused.dtm_grid.ravel()], 1)
    pts = pts[pts[:, 2] != -1e4]
    assert pts.shape == dtm_pts.shape
    assert np.array_equal(pts, dtm_pts)


def test_agl_matches_chain(fused, chain):
    data, _ = chain
    agl = gen_agl(build_dtm(data[:, :3]), data[:, :3])
    # identical 4-NN sets; ulp-level summation-order tolerance, same
    # class as the existing AGL engine pairs (tests/test_dtm.py)
    np.testing.assert_allclose(fused.data[:, 3], agl, atol=1e-9)


def test_block_indices_byte_equal(fused, chain):
    data, labels = chain
    r_ref = np.random.default_rng(11)
    bi_ref = room2blocks(
        data, labels, 2000, block_size=30.0, stride=30.0,
        random_sample=False, use_all_points=False, rng=r_ref,
        return_indices=True,
    )
    r_fused = np.random.default_rng(11)
    blocks = []
    for sel in fused.window_candidates():
        _, sub = sample_data(sel[:, None], 2000, r_fused)
        blocks.append(sel[sub][None])
    bi_fused = np.concatenate(blocks, 0)
    assert np.array_equal(bi_ref, bi_fused)


def test_ragged_candidates_byte_equal(fused, chain):
    data, labels = chain
    ragged = room2blocks(
        data, labels, 2000, block_size=30.0, stride=30.0,
        random_sample=False, use_all_points=True,
        rng=np.random.default_rng(0), return_indices=True,
    )
    cands = fused.window_candidates()
    assert len(cands) == len(ragged)
    for a, b in zip(cands, ragged):
        assert np.array_equal(a, b)
    # window qualification mirrors room2blocks' threshold
    assert all(len(c) >= MIN_BLOCK_POINTS for c in cands)


def test_env_gate_and_fallbacks(tile, monkeypatch):
    monkeypatch.setenv("DGCNN_TILE_LOAD", "0")
    assert load_tile_las(tile, FEATS, list(FEATS)) is None
    monkeypatch.delenv("DGCNN_TILE_LOAD")
    # non-canonical x/y/z columns → positional build_dtm/room2blocks
    # equivalence doesn't hold → fall back
    assert load_tile_las(
        tile, {"x": 1, "y": 0, "z": 2, "agl": 3}, None) is None
    # no AGL column mapped → the fused call has nowhere to write AGL
    assert load_tile_las(tile, {"x": 0, "y": 1, "z": 2}, None) is None
    # unsupported dtm kwargs (external binary / tin dump) → fall back
    assert load_tile_las(
        tile, FEATS, None, dtm_kwargs={"module_path": "/x"}) is None
    # non-LAS input → fall back
    assert load_tile_las("/tmp/nonexistent.h5", FEATS, None) is None


def test_dtm_kwargs_respected(tile, chain):
    data, _ = chain
    kw = {"cell_size": 2.0, "dtm_buffer": 4.0, "remove_buildings": False}
    tl = load_tile_las(tile, FEATS, list(FEATS), dtm_kwargs=kw)
    if tl is None:
        pytest.skip("native dtmgen_tile_load unavailable")
    dtm_pts = build_dtm(data[:, :3], **kw)
    edge = tl.dtm_grid.shape[0]
    xs = tl.geo[0] + np.arange(edge) * 2.0
    ys = tl.geo[1] + np.arange(edge) * 2.0
    gx, gy = np.meshgrid(xs, ys, indexing="ij")
    pts = np.stack([gx.ravel(), gy.ravel(), tl.dtm_grid.ravel()], 1)
    pts = pts[pts[:, 2] != -1e4]
    assert np.array_equal(pts, dtm_pts)
    agl = gen_agl(dtm_pts, data[:, :3])
    np.testing.assert_allclose(tl.data[:, 3], agl, atol=1e-9)


def test_all_noise_tile(tmp_path):
    # isolated points only: the filter drops everything → empty-but-valid
    rng = np.random.default_rng(0)
    n = 50
    xy = rng.random((n, 2)) * 1e4  # ~200 m apart on average
    path = str(tmp_path / "noise.las")
    write_las(path, xy[:, 0], xy[:, 1], np.zeros(n), np.full(n, 2))
    tl = load_tile_las(path, FEATS, list(FEATS))
    if tl is None:
        pytest.skip("native dtmgen_tile_load unavailable")
    assert len(tl.data) == 0 and tl.dropped == n
    assert tl.window_candidates() == []


def test_row_capacity_retry(tile, fused):
    """A first call with too-small win_rows capacity re-calls with the
    exact needed size and still produces the identical result."""
    tl = load_tile_las(tile, FEATS, list(FEATS), _cap_rows=1)
    assert tl is not None
    assert np.array_equal(tl.win_counts, fused.win_counts)
    assert np.array_equal(tl.win_rows, fused.win_rows)
    assert len(fused.win_rows) == int(np.sum(fused.win_counts))


def test_predict_e2e_fused_vs_chain(tile, tmp_path, monkeypatch):
    """predict() end to end: fused tile load vs the separate-stage chain
    produce byte-identical predictions and output LAS."""
    import jax

    from dgcnn_tpu.eval.predict import predict
    from dgcnn_tpu.models.dgcnn import DGCNNConfig, init_dgcnn
    from dgcnn_tpu.train.checkpoint import save_checkpoint
    from dgcnn_tpu.utils.logging import IOStream

    cfg = DGCNNConfig(num_classes=5, num_features=4, k=12)
    params, state = init_dgcnn(jax.random.key(0), cfg)
    root = tmp_path / "ckpt"
    os.makedirs(root, exist_ok=True)
    save_checkpoint(
        str(root / "m.npz"), {"params": params, "bn_state": state})
    io = IOStream(str(tmp_path / "log.txt"))
    kw = dict(
        k=12, io=io, pointcloud_file=tile, num_points=2000,
        num_classes=5, num_features=4, model_label="m",
        model_root=str(root), batch_size=4, knn_impl="xla", seed=5,
    )
    out_a = str(tmp_path / "a.las")
    data_a, pred_a = predict(pred_pointcloud_file=out_a, **kw)
    monkeypatch.setenv("DGCNN_TILE_LOAD", "0")
    out_b = str(tmp_path / "b.las")
    data_b, pred_b = predict(pred_pointcloud_file=out_b, **kw)
    assert np.array_equal(pred_a, pred_b)
    np.testing.assert_allclose(data_a, data_b, atol=1e-9)
    with open(out_a, "rb") as fa, open(out_b, "rb") as fb:
        assert fa.read() == fb.read()
