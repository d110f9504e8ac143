"""Loss tests: hand-computed smoothing golden values and mask semantics
(/root/reference/util.py:17-34, /root/reference/train.py:167-197)."""

import jax.numpy as jnp
import numpy as np
import pytest

from dgcnn_tpu.ops.losses import masked_smoothed_cross_entropy, smoothed_cross_entropy


def _np_smoothed_ce(logits, labels, eps=0.2):
    logits = np.asarray(logits, np.float64)
    logp = logits - np.log(np.exp(logits).sum(-1, keepdims=True))
    c = logits.shape[-1]
    one_hot = np.eye(c)[labels]
    w = one_hot * (1 - eps) + (1 - one_hot) * eps / (c - 1)
    return float(-(w * logp).sum(-1).mean())


def test_smoothed_ce_golden():
    logits = jnp.asarray([[2.0, 0.0, -1.0], [0.5, 0.5, 0.5]])
    labels = jnp.asarray([0, 2])
    got = float(smoothed_cross_entropy(logits, labels))
    want = _np_smoothed_ce(logits, np.asarray(labels))
    assert got == pytest.approx(want, abs=1e-5)


def test_unsmoothed_is_plain_ce():
    logits = jnp.asarray([[3.0, 1.0], [0.0, 0.0]])
    labels = jnp.asarray([0, 1])
    got = float(smoothed_cross_entropy(logits, labels, smoothing=False))
    p = np.exp(np.asarray(logits))
    p /= p.sum(-1, keepdims=True)
    want = float(-np.log([p[0, 0], p[1, 1]]).mean())
    assert got == pytest.approx(want, abs=1e-6)


def test_masked_ce_ignores_unmasked(rng):
    logits = jnp.asarray(rng.standard_normal((2, 10, 4)).astype(np.float32))
    labels = jnp.asarray(rng.integers(0, 4, (2, 10)))
    mask = np.zeros((2, 10), np.float32)
    mask[0, :5] = 1.0
    got = float(masked_smoothed_cross_entropy(logits, labels, jnp.asarray(mask)))
    want = _np_smoothed_ce(np.asarray(logits)[0, :5], np.asarray(labels)[0, :5])
    assert got == pytest.approx(want, abs=1e-4)


def test_masked_ce_all_masked_equals_unmasked(rng):
    logits = jnp.asarray(rng.standard_normal((1, 8, 3)).astype(np.float32))
    labels = jnp.asarray(rng.integers(0, 3, (1, 8)))
    full = float(smoothed_cross_entropy(logits.reshape(-1, 3), labels.reshape(-1)))
    masked = float(
        masked_smoothed_cross_entropy(logits, labels, jnp.ones((1, 8)))
    )
    assert masked == pytest.approx(full, abs=1e-6)


def test_masked_ce_zero_mask_is_finite():
    logits = jnp.zeros((1, 4, 3))
    labels = jnp.zeros((1, 4), jnp.int32)
    out = float(masked_smoothed_cross_entropy(logits, labels, jnp.zeros((1, 4))))
    assert out == 0.0
