"""Metric tests vs sklearn (the reference's metric source,
/root/reference/train.py:213-222, /root/reference/util.py:60-76)."""

import jax.numpy as jnp
import numpy as np
import pytest
import sklearn.metrics as skm

from dgcnn_tpu.ops.metrics import (
    accuracy_from_confusion,
    balanced_accuracy_from_confusion,
    calculate_sem_iou,
    confusion_matrix,
    iou_from_confusion,
)


def test_confusion_matrix_matches_sklearn(rng):
    true = rng.integers(0, 5, 1000)
    pred = rng.integers(0, 5, 1000)
    got = np.asarray(confusion_matrix(jnp.asarray(pred), jnp.asarray(true), 5))
    want = skm.confusion_matrix(true, pred, labels=range(5))
    np.testing.assert_array_equal(got, want)


def test_accuracy_and_balanced_accuracy(rng):
    true = rng.integers(0, 4, 500)
    pred = rng.integers(0, 4, 500)
    cm = confusion_matrix(jnp.asarray(pred), jnp.asarray(true), 4)
    assert float(accuracy_from_confusion(cm)) == pytest.approx(
        skm.accuracy_score(true, pred), abs=1e-6
    )
    assert float(balanced_accuracy_from_confusion(cm)) == pytest.approx(
        skm.balanced_accuracy_score(true, pred), abs=1e-6
    )


def test_balanced_accuracy_absent_class(rng):
    # class 3 never appears in y_true -> sklearn excludes it from the mean
    true = rng.integers(0, 3, 300)
    pred = rng.integers(0, 4, 300)
    cm = confusion_matrix(jnp.asarray(pred), jnp.asarray(true), 4)
    assert float(balanced_accuracy_from_confusion(cm)) == pytest.approx(
        skm.balanced_accuracy_score(true, pred), abs=1e-6
    )


def test_out_of_range_labels_dropped():
    # UNCLASSIFIED=31 markers (/root/reference/test.py:15) must not crash
    true = jnp.asarray([0, 1, 2, 1])
    pred = jnp.asarray([0, 31, 2, 1])
    cm = np.asarray(confusion_matrix(pred, true, 3))
    assert cm.sum() == 3  # the 31 was dropped
    assert cm[1, 1] == 1 and cm[0, 0] == 1 and cm[2, 2] == 1


def test_iou_matches_reference_formula(rng):
    true = rng.integers(0, 3, (4, 100))
    pred = rng.integers(0, 3, (4, 100))
    want = calculate_sem_iou(list(pred), list(true), 3)
    cm = confusion_matrix(jnp.asarray(pred), jnp.asarray(true), 3)
    got = np.asarray(iou_from_confusion(cm))
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_masked_confusion(rng):
    true = rng.integers(0, 3, 100)
    pred = rng.integers(0, 3, 100)
    w = (rng.random(100) > 0.5).astype(np.float32)
    cm = np.asarray(
        confusion_matrix(jnp.asarray(pred), jnp.asarray(true), 3, jnp.asarray(w))
    )
    keep = w > 0
    want = skm.confusion_matrix(true[keep], pred[keep], labels=range(3))
    np.testing.assert_array_equal(cm, want)
