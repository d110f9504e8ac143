"""Data pipeline tests: sampling distributions, mask semantics, room store,
fixed-shape batching (/root/reference/data.py)."""

import numpy as np
import pytest

from dgcnn_tpu.data.dataset import FugroDataset, collate
from dgcnn_tpu.data.sampling import (
    class_counts,
    create_train_mask,
    inverse_class_weights,
    sample_point_indices,
    weighted_choice_no_replacement,
)


def _write_rooms(tmp_path, n_rooms=5, n_points=400, n_feat=4, seed=0):
    rng = np.random.default_rng(seed)
    for i in range(n_rooms):
        pts = rng.random((n_points, n_feat)) * 30
        labels = rng.integers(0, 5, (n_points, 1))
        np.save(tmp_path / f"Area_{i}.npy", np.hstack([pts, labels]))
    return tmp_path


def test_class_counts():
    labels = np.array([0, 0, 1, 2, 2, 2])
    np.testing.assert_array_equal(class_counts(labels, 4), [2, 1, 3, 0])


def test_inverse_class_weights_prefers_rare(rng):
    labels = np.array([0] * 90 + [1] * 10)
    w = inverse_class_weights(labels, 2)
    assert w[-1] > w[0]  # rare class points weigh more
    assert w.sum() == pytest.approx(1.0)


def test_inverse_class_weights_uniform_fallback():
    labels = np.zeros(10, np.int64)  # single class -> tot-count == 0 for it
    w = inverse_class_weights(labels, 1)
    np.testing.assert_allclose(w, 0.1)


def test_weighted_choice_no_replacement_exact(rng):
    w = np.array([0.0, 0.5, 0.5, 0.0])
    for _ in range(20):
        sel = weighted_choice_no_replacement(rng, w, 2)
        assert set(sel) == {1, 2}


def test_weighted_choice_distribution(rng):
    w = np.array([0.7, 0.2, 0.1])
    firsts = np.zeros(3)
    for _ in range(3000):
        sel = weighted_choice_no_replacement(rng, w, 1)
        firsts[sel[0]] += 1
    np.testing.assert_allclose(firsts / 3000, w, atol=0.03)


def test_sample_point_indices_no_duplicates(rng):
    labels = np.array([0] * 50 + [1] * 50)
    sel = sample_point_indices(rng, labels, 2, 60)
    assert len(np.unique(sel)) == 60


def test_create_train_mask_budget(rng):
    labels = np.array([0] * 100 + [1] * 30 + [2] * 70)
    mask = create_train_mask(rng, labels, 3)
    m = int(min(30, np.floor(len(labels) / 3)))
    for c in range(3):
        assert mask[labels == c].sum() == m


def test_create_train_mask_exclude(rng):
    labels = np.array([0] * 50 + [1] * 50)
    mask = create_train_mask(rng, labels, 2, exclude_classes=(1,))
    assert mask[labels == 1].sum() == 0
    assert mask[labels == 0].sum() > 0


def test_create_train_mask_absent_class_empty(rng):
    # reference semantics: m = min over ALL non-excluded class counts,
    # so a missing class zeroes the budget (/root/reference/data.py:95-96)
    labels = np.array([0] * 50 + [1] * 50)
    mask = create_train_mask(rng, labels, 3)
    assert mask.sum() == 0


def test_dataset_split_disjoint(tmp_path):
    _write_rooms(tmp_path)
    train = FugroDataset("train", str(tmp_path), num_point=64, seed=7)
    val = FugroDataset("validation", str(tmp_path), num_point=64, seed=7)
    assert set(train.room_names).isdisjoint(val.room_names)
    assert len(train) + len(val) == 5
    assert len(val) == 1  # floor(5 * 0.2)


def test_dataset_getitem_shapes(tmp_path):
    _write_rooms(tmp_path)
    ds = FugroDataset("train", str(tmp_path), num_point=64, seed=7)
    pts, labels, idx = ds[0]
    assert pts.shape == (64, 4) and labels.shape == (64,)
    assert 0 <= idx < len(ds)


def test_dataset_batches_fixed_shape(tmp_path):
    _write_rooms(tmp_path)
    ds = FugroDataset("train", str(tmp_path), num_point=64, seed=7)
    batches = list(ds.batches(2, epoch=0))
    assert len(batches) == len(ds) // 2
    for b in batches:
        assert b.points.shape == (2, 64, 4)
        assert b.labels.shape == (2, 64)
        assert b.mask.shape == (2, 64)
        assert b.points.dtype == np.float32
        # mask only on valid labels
        assert set(np.unique(b.mask)) <= {0.0, 1.0}


def test_dataset_batches_deterministic(tmp_path):
    _write_rooms(tmp_path)
    a = FugroDataset("train", str(tmp_path), num_point=32, seed=3)
    b = FugroDataset("train", str(tmp_path), num_point=32, seed=3)
    ba = next(a.batches(2, epoch=5))
    bb = next(b.batches(2, epoch=5))
    np.testing.assert_array_equal(ba.points, bb.points)
    np.testing.assert_array_equal(ba.mask, bb.mask)


def test_collate_pad_and_truncate(rng):
    pts = [rng.random((10, 3)).astype(np.float32),
           rng.random((6, 3)).astype(np.float32)]
    labels = [rng.integers(0, 3, 10), rng.integers(0, 3, 6)]
    p, l, v = collate(pts, labels, mode="pad")
    assert p.shape == (2, 10, 3) and v[1, 6:].sum() == 0 and v[1, :6].all()
    np.testing.assert_array_equal(p[1, 6:], np.broadcast_to(pts[1][0], (4, 3)))
    p2, l2, v2 = collate(pts, labels, mode="truncate")
    assert p2.shape == (2, 6, 3) and v2.all()


def test_dataset_sort_points(tmp_path):
    """sort_points=True (default) yields x-sorted samples — the TPU
    gather-locality layout — drawing the SAME point set as
    sort_points=False with the same rng stream; False restores the
    reference's random sample order (/root/reference/data.py:146-163)."""
    _write_rooms(tmp_path)
    ds = FugroDataset("train", str(tmp_path), num_point=32, seed=3)
    pts, labels, _ = ds[0]
    assert np.all(np.diff(pts[:, 0]) >= 0)

    raw = FugroDataset("train", str(tmp_path), num_point=32, seed=3,
                       sort_points=False)
    pts_r, labels_r, _ = raw[0]
    # same sampled multiset, different order
    key = lambda p, l: sorted(map(tuple, np.column_stack([p, l])))
    assert key(pts, labels) == key(pts_r, labels_r)
