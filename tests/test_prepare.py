"""Preparation-stage tests: tiling window math, subsampling, class remap,
noise filter, pointcloud loaders
(/root/reference/prepare_data/pointcloud_util.py, process_data.py)."""

import numpy as np
import pytest

from dgcnn_tpu.io.las import write_las
from dgcnn_tpu.prepare.blocks import room2blocks, sample_data
from dgcnn_tpu.prepare.labels import convert_pc_labels
from dgcnn_tpu.prepare.loaders import load_pointcloud
from dgcnn_tpu.prepare.noise import filter_noise


def grid_cloud(rng, extent=50.0, n=30000, feat_extra=1):
    data = np.column_stack(
        [rng.random(n) * extent, rng.random(n) * extent, rng.random(n) * 10]
        + [rng.random(n) for _ in range(feat_extra)]
    )
    labels = rng.integers(0, 5, n)
    return data, labels


def test_sample_data_down_and_up(rng):
    d = rng.random((100, 3))
    down, idx = sample_data(d, 40, rng)
    assert down.shape == (40, 3) and len(np.unique(idx)) == 40
    up, idx2 = sample_data(d, 150, rng)
    assert up.shape == (150, 3)
    np.testing.assert_array_equal(up[:100], d)  # originals kept first


def test_room2blocks_grid_mode_covers_room(rng):
    data, labels = grid_cloud(rng)
    bd, bl = room2blocks(data, labels, 512, block_size=25.0, stride=25.0,
                         rng=rng)
    assert bd.shape[1:] == (512, 4) and bl.shape[1:] == (512,)
    assert len(bd) == 4  # 50/25 x 50/25 non-overlapping windows
    # every block's points lie inside a 25 m window
    for b in bd:
        assert b[:, 0].max() - b[:, 0].min() <= 25.0
        assert b[:, 1].max() - b[:, 1].min() <= 25.0


def test_room2blocks_overlap_stride(rng):
    data, labels = grid_cloud(rng)
    bd, _ = room2blocks(data, labels, 256, block_size=25.0, stride=12.5,
                        rng=rng)
    assert len(bd) > 4  # overlapping sweep produces more windows


def test_room2blocks_random_mode(rng):
    data, labels = grid_cloud(rng)
    bd, bl = room2blocks(data, labels, 300, block_size=20.0, stride=10.0,
                         random_sample=True, sample_num=6, rng=rng)
    assert bd.shape == (6, 300, 4)


def test_room2blocks_use_all_points(rng):
    data, labels = grid_cloud(rng)
    bd, bl = room2blocks(data, labels, 0, block_size=25.0, stride=25.0,
                         use_all_points=True, rng=rng)
    assert bd.dtype == object
    total = sum(len(b) for b in bd)
    assert total == len(data)  # non-overlapping grid keeps every point once


def test_room2blocks_sparse_block_rejected(rng):
    # 500 points in one corner, empty elsewhere -> no window reaches 1000
    data = np.column_stack([rng.random(500), rng.random(500),
                            rng.random(500)])
    bd, _ = room2blocks(data, np.zeros(500), 100, block_size=1.0, stride=1.0,
                        rng=rng)
    assert len(bd) == 0


def test_convert_pc_labels_reference_map(rng):
    # params/class_map.json: {2:1, 3:2, 4:2, 5:2, 6:0}; others dropped
    cmap = {2: 1, 3: 2, 4: 2, 5: 2, 6: 0}
    labels = np.array([1, 2, 3, 4, 5, 6, 7, 31])
    data = np.arange(16).reshape(8, 2).astype(float)
    out_d, out_l = convert_pc_labels(data, labels, cmap)
    np.testing.assert_array_equal(out_l, [1, 2, 2, 2, 0])
    np.testing.assert_array_equal(out_d, data[[1, 2, 3, 4, 5]])


def test_convert_pc_labels_no_chain_remap():
    # key 2 -> 1 and key 1 absent: points with raw label 1 are DROPPED, and
    # a remapped 1 must not be re-remapped (the reference's sequential
    # in-place loop could chain when keys overlap values)
    cmap = {2: 1, 1: 0}
    labels = np.array([2, 1])
    data = np.zeros((2, 1))
    _, out_l = convert_pc_labels(data, labels, cmap)
    np.testing.assert_array_equal(out_l, [1, 0])


def test_filter_noise(rng):
    dense = rng.random((200, 3))  # unit cube, dense -> all kept
    far = np.array([[100.0, 100.0, 100.0]])  # isolated
    keep = filter_noise(np.vstack([dense, far]))
    assert keep[:200].all() and not keep[200]


def test_load_pointcloud_las(tmp_path, rng):
    n = 1500
    x, y = rng.random(n) * 30, rng.random(n) * 30
    z = rng.random(n) * 5
    cls = rng.integers(0, 8, n)
    path = str(tmp_path / "cloud.las")
    write_las(path, x, y, z, cls)
    features = {"x": 0, "y": 1, "z": 2, "agl": 3}
    data, labels = load_pointcloud(
        path, features_output=["x", "y", "z", "agl"], features=features,
        filter_noise_points=False,
    )
    assert data.shape == (n, 4)
    np.testing.assert_allclose(data[:, 0], x, atol=1e-3)
    np.testing.assert_array_equal(labels, cls & 0x1F)
    np.testing.assert_array_equal(data[:, 3], 0.0)  # agl zero-filled


def test_load_pointcloud_h5(tmp_path, rng):
    import h5py

    n = 800
    pos = rng.random((n, 3)) * 20
    cls = rng.integers(0, 6, n)
    agl = rng.random(n)
    path = str(tmp_path / "c.h5")
    with h5py.File(path, "w") as f:
        f.create_dataset("LAS/Position", data=pos)
        f.create_dataset("LAS/Classification", data=cls)
        f.create_dataset("AGL", data=agl)
    data, labels = load_pointcloud(
        path, features_output=["x", "y", "z", "agl"],
        features={"x": 0, "y": 1, "z": 2, "agl": 3},
        filter_noise_points=False,
    )
    np.testing.assert_allclose(data[:, :3], pos)
    np.testing.assert_allclose(data[:, 3], agl)


def test_load_pointcloud_requires_xyz(tmp_path):
    with pytest.raises(ValueError, match="position"):
        load_pointcloud("x.las", features={"x": 0, "y": 1})


def test_load_pointcloud_bad_extension(tmp_path):
    p = tmp_path / "c.xyz"
    p.write_text("")
    with pytest.raises(ValueError, match="Unsupported"):
        load_pointcloud(str(p), features={"x": 0, "y": 1, "z": 2})


def test_room2blocks_return_indices_matches_copies():
    """return_indices=True must select exactly the rows of the copy path
    (identical rng draw sequence) in both grid and all-points modes."""
    import numpy as np

    from dgcnn_tpu.prepare.blocks import room2blocks

    rng_pts = np.random.default_rng(3)
    data = np.column_stack([
        rng_pts.random(30000) * 70, rng_pts.random(30000) * 70,
        rng_pts.random(30000) * 5, rng_pts.random(30000),
    ])
    labels = rng_pts.integers(0, 5, 30000)

    kw = dict(block_size=30.0, stride=30.0, random_sample=False,
              min_points=500)
    want_d, want_l = room2blocks(
        data, labels, 256, rng=np.random.default_rng(0), **kw)
    idx = room2blocks(
        data, labels, 256, rng=np.random.default_rng(0),
        return_indices=True, **kw)
    np.testing.assert_array_equal(data[idx], want_d)
    np.testing.assert_array_equal(labels[idx], want_l)

    want_od, _ = room2blocks(
        data, labels, 256, rng=np.random.default_rng(0),
        use_all_points=True, **kw)
    oidx = room2blocks(
        data, labels, 256, rng=np.random.default_rng(0),
        use_all_points=True, return_indices=True, **kw)
    assert len(oidx) == len(want_od)
    for bi, bd in zip(oidx, want_od):
        np.testing.assert_array_equal(data[bi], bd)
