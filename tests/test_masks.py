"""In-graph balanced-mask tests: budget semantics identical to the host
sampler (/root/reference/data.py:80-105 intent)."""

import jax
import jax.numpy as jnp
import numpy as np

from dgcnn_tpu.ops.masks import balanced_train_mask


def test_budget_per_class(rng):
    labels = np.concatenate([
        np.zeros(100), np.ones(30), np.full(70, 2)
    ]).astype(np.int32)
    labels = np.stack([labels, labels[::-1]])
    mask = np.asarray(
        balanced_train_mask(jax.random.key(0), jnp.asarray(labels), 3)
    )
    m = min(30, labels.shape[1] // 3)
    for b in range(2):
        for c in range(3):
            assert mask[b][labels[b] == c].sum() == m


def test_exclude_classes(rng):
    labels = np.stack([np.concatenate([np.zeros(50), np.ones(50)])]).astype(np.int32)
    mask = np.asarray(
        balanced_train_mask(jax.random.key(1), jnp.asarray(labels), 2,
                            exclude=(1,))
    )
    assert mask[0][labels[0] == 1].sum() == 0
    assert mask[0][labels[0] == 0].sum() == 50


def test_absent_class_zero_budget():
    # reference semantics: a class with zero points zeroes the whole budget
    labels = jnp.zeros((1, 60), jnp.int32)
    mask = np.asarray(balanced_train_mask(jax.random.key(2), labels, 3))
    assert mask.sum() == 0


def test_randomness_differs_between_keys():
    # unequal class sizes -> budget below the largest class count, so the
    # random selection actually matters
    labels = jnp.asarray(np.concatenate(
        [np.zeros(120), np.ones(40), np.full(40, 2), np.full(40, 3)]
    )[None].astype(np.int32))
    a = np.asarray(balanced_train_mask(jax.random.key(1), labels, 4))
    b = np.asarray(balanced_train_mask(jax.random.key(2), labels, 4))
    assert (a != b).any()
    assert a.sum() == b.sum()  # same budget


def test_jit_under_vmap_style_batch():
    labels = jnp.asarray(
        np.random.default_rng(0).integers(0, 5, (8, 256)).astype(np.int32)
    )
    mask = balanced_train_mask(jax.random.key(3), labels, 5)
    assert mask.shape == (8, 256)
    assert set(np.unique(np.asarray(mask))) <= {0.0, 1.0}


def test_matches_host_sampler_budget(rng):
    from dgcnn_tpu.data.sampling import create_train_mask

    labels = rng.integers(0, 4, 300).astype(np.int32)
    host = create_train_mask(rng, labels, 4)
    dev = np.asarray(
        balanced_train_mask(jax.random.key(5), jnp.asarray(labels[None]), 4)
    )[0]
    assert host.sum() == dev.sum()
    for c in range(4):
        assert host[labels == c].sum() == dev[labels == c].sum()
