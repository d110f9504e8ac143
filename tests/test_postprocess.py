"""Post-processing tests: prob maps, multi-scale fusion semantics, metrics,
LAS export (reference postprocess_data/*, predictions.py)."""

import numpy as np
import pytest

from dgcnn_tpu.io.las import read_las
from dgcnn_tpu.postprocess.combine import combine_dirs, combine_rooms
from dgcnn_tpu.postprocess.las_export import export_dir, predictions_to_las
from dgcnn_tpu.postprocess.metrics import evaluate_combined_dir
from dgcnn_tpu.postprocess.prob_map import add_probability_columns, process_dir


def _dump_rows(rng, n=50, n_classes=3, pred=None, gt=None, xyz=None):
    """Synthesise dump rows: xyz(3) rni(3) pred gt logits(n_classes)."""
    xyz = xyz if xyz is not None else rng.random((n, 3)).round(3) * 100
    rni = rng.random((n, 3))
    pred = pred if pred is not None else rng.integers(0, n_classes, n)
    gt = gt if gt is not None else rng.integers(0, n_classes, n)
    logits = rng.standard_normal((n, n_classes))
    return np.column_stack([xyz, rni, pred, gt, logits])


def test_add_probability_columns(rng):
    rows = _dump_rows(rng)
    out = add_probability_columns(rows)
    np.testing.assert_allclose(out[:, 8:].sum(1), 1.0, atol=1e-9)
    np.testing.assert_array_equal(out[:, :8], rows[:, :8])


def test_combine_agree_and_disagree(rng):
    xyz = rng.random((4, 3)).round(3) * 10
    r1 = _dump_rows(rng, n=4, xyz=xyz, pred=np.array([0, 1, 1, 2]),
                    gt=np.array([0, 1, 2, 2]))
    r2 = _dump_rows(rng, n=4, xyz=xyz, pred=np.array([0, 2, 1, 1]),
                    gt=np.array([0, 1, 2, 2]))
    # make probabilities explicit: r1 confident on row1, r2 on row3
    r1[:, 8:] = 0.0
    r2[:, 8:] = 0.0
    r1[1, 8 + 1] = 0.9
    r2[1, 8 + 2] = 0.5
    r1[3, 8 + 2] = 0.2
    r2[3, 8 + 1] = 0.8
    out = combine_rooms(r1, r2)
    assert out.shape[1] == 8
    key = {tuple(row[:3]): row for row in out}
    for i, x in enumerate(map(tuple, xyz)):
        row = key[x]
        if i == 0:
            assert row[6] == 0        # agree
        if i == 1:
            assert row[6] == 1        # r1 more confident
        if i == 3:
            assert row[6] == 1        # r2 more confident
        assert row[7] == r1[i, 7]     # gt carried from run 1


def test_combine_only_colocated(rng):
    r1 = _dump_rows(rng, n=10)
    r2 = _dump_rows(rng, n=10)
    r2[:, :3] += 1000  # no co-locations
    out = combine_rooms(r1, r2)
    assert len(out) == 0


def test_full_postprocess_roundtrip(tmp_path, rng):
    # write two runs' dumps, prob-map + combine + metrics + las export
    d1 = tmp_path / "run1"
    d2 = tmp_path / "run2"
    comb = tmp_path / "combined"
    d1.mkdir(), d2.mkdir()
    xyz = rng.random((60, 3)).round(3) * 50
    gt = rng.integers(0, 3, 60)
    for d, acc in ((d1, 0.9), (d2, 0.6)):
        pred = np.where(rng.random(60) < acc, gt, (gt + 1) % 3)
        rows = _dump_rows(rng, n=60, xyz=xyz, pred=pred, gt=gt)
        np.savetxt(d / "Area_1_room_0_pred_gt.txt", rows, fmt="%f")

    probs = process_dir(str(d1), str(tmp_path / "prob"), "1")
    assert len(probs) == 1

    written = combine_dirs(str(d1), str(d2), str(comb), "1")
    assert len(written) == 1
    m = evaluate_combined_dir(str(comb), 3, "1")
    assert 0.0 <= m["accuracy"] <= 1.0 and m["rooms"] == 1
    assert len(m["iou"]) == 3

    las_out = export_dir(str(d1), str(tmp_path / "las"))
    assert len(las_out) == 1
    back = read_las(las_out[0])
    assert len(back) == 60


def test_predictions_to_las(tmp_path, rng):
    rows = np.column_stack(
        [rng.random((20, 3)) * 10, rng.integers(0, 5, 20)]
    )
    f = tmp_path / "Area_1_room_0_pred_gt.txt"
    np.savetxt(f, rows, fmt="%f")
    pts, labels = predictions_to_las(str(f), str(tmp_path / "o.las"))
    back = read_las(str(tmp_path / "o.las"))
    np.testing.assert_array_equal(back.classification, rows[:, 3])
    np.testing.assert_allclose(back.x, rows[:, 0], atol=1e-3)
