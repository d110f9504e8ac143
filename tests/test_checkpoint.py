"""Checkpoint tests: round-trip fidelity (incl. PRNG keys and optimizer
state), best-only policy semantics, resume behaviour, corrupt-file fallback
(/root/reference/train.py:127-138, :301-312)."""

import os

import jax
import jax.numpy as jnp
import numpy as np

from dgcnn_tpu.models.dgcnn import DGCNNConfig
from dgcnn_tpu.train.checkpoint import (
    load_checkpoint,
    save_checkpoint,
    try_resume,
)
from dgcnn_tpu.train.steps import init_train_state, make_optimizer

CFG = DGCNNConfig(num_classes=3, num_features=4, k=5, emb_dims=32,
                  knn_query_chunk=None)


def _state():
    tx = make_optimizer()
    return init_train_state(jax.random.key(7), CFG, tx), tx


def test_round_trip_full_train_state(tmp_path):
    state, _ = _state()
    path = str(tmp_path / "ck.npz")
    save_checkpoint(path, state, epoch=4, mBPCA=0.87)
    restored, meta = load_checkpoint(path, state)
    assert meta == {"epoch": 4.0, "mBPCA": 0.87}
    for a, b in zip(jax.tree_util.tree_leaves(state.params),
                    jax.tree_util.tree_leaves(restored.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # PRNG key survives and is usable
    k1 = jax.random.normal(state.rng, (3,))
    k2 = jax.random.normal(restored.rng, (3,))
    np.testing.assert_array_equal(np.asarray(k1), np.asarray(k2))
    assert int(restored.step) == int(state.step)


def test_try_resume_missing(tmp_path):
    state, _ = _state()
    assert try_resume(str(tmp_path / "nope.npz"), state) is None


def test_try_resume_corrupt(tmp_path):
    state, _ = _state()
    p = tmp_path / "bad.npz"
    p.write_bytes(b"not an npz at all")
    assert try_resume(str(p), state) is None


def test_structural_mismatch_rejected(tmp_path):
    state, _ = _state()
    path = str(tmp_path / "ck.npz")
    save_checkpoint(path, state, epoch=0, mBPCA=0.0)
    other_cfg = DGCNNConfig(num_classes=4, num_features=4, k=5, emb_dims=32)
    other, _ = (init_train_state(jax.random.key(0), other_cfg,
                                 make_optimizer()), None)
    assert try_resume(path, other) is None  # shape mismatch -> fresh start


def test_atomic_overwrite(tmp_path):
    state, _ = _state()
    path = str(tmp_path / "ck.npz")
    save_checkpoint(path, state, epoch=0, mBPCA=0.1)
    save_checkpoint(path, state, epoch=1, mBPCA=0.2)
    _, meta = load_checkpoint(path, state)
    assert meta["epoch"] == 1.0


def _sharded_state(mesh):
    """TrainState with genuinely sharded leaves (conv weights split over
    'data') next to replicated ones — the multi-host checkpoint case."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    cfg = DGCNNConfig(num_classes=4, num_features=3, k=5, emb_dims=64)
    tx = make_optimizer()
    state = init_train_state(jax.random.key(3), cfg, tx)
    shard = NamedSharding(mesh, P("data"))

    def place(path, leaf):
        name = jax.tree_util.keystr(path)
        if hasattr(leaf, "shape") and getattr(leaf, "ndim", 0) >= 1 and \
                leaf.shape[0] % mesh.shape["data"] == 0 and "conv" in name:
            return jax.device_put(leaf, shard)
        return leaf

    params = jax.tree_util.tree_map_with_path(place, state.params)
    import dataclasses

    return dataclasses.replace(state, params=params)


def test_sharded_checkpoint_round_trip(tmp_path):
    """Sharded save/restore: a TrainState with device-sharded conv weights
    round-trips through the directory layout, restoring onto the template's
    shardings."""
    import pytest

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 devices")
    from dgcnn_tpu.parallel.mesh import make_mesh
    from dgcnn_tpu.train.checkpoint import (
        load_checkpoint_sharded,
        save_checkpoint_sharded,
    )

    mesh = make_mesh(n_data=4, n_points=2)
    state = _sharded_state(mesh)
    path = str(tmp_path / "ckpt_dir")
    save_checkpoint_sharded(path, state, epoch=7, mBPCA=0.91)
    got, meta = load_checkpoint_sharded(path, state)
    assert meta == {"epoch": 7.0, "mBPCA": 0.91}
    for a, b in zip(jax.tree_util.tree_leaves(state),
                    jax.tree_util.tree_leaves(got)):
        if jax.dtypes.issubdtype(getattr(a, "dtype", np.float32),
                                 jax.dtypes.prng_key):
            a, b = jax.random.key_data(a), jax.random.key_data(b)
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # restored leaves carry the template's shardings
    w = got.params["conv6"]["w"]
    assert w.sharding == state.params["conv6"]["w"].sharding


def _shard_file(path, pid=0):
    """The (nonce-suffixed) shard file a save wrote for this process."""
    import glob as _g

    return sorted(_g.glob(os.path.join(path, f"shards_p{pid}_*.npz")))[-1]


def test_sharded_checkpoint_two_process_layout(tmp_path):
    """A checkpoint whose shards are spread over several shards_p*.npz
    files (as a 2-process writer produces on a shared filesystem) must
    reassemble — and try_resume must dispatch to the directory layout."""
    import json

    import pytest

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 devices")
    from dgcnn_tpu.parallel.mesh import make_mesh
    from dgcnn_tpu.train.checkpoint import save_checkpoint_sharded

    mesh = make_mesh(n_data=4, n_points=2)
    state = _sharded_state(mesh)
    path = str(tmp_path / "ckpt2")
    save_checkpoint_sharded(path, state, epoch=2, mBPCA=0.5)

    # split the single writer's file into two "process" files
    src = _shard_file(path)
    with np.load(src, allow_pickle=False) as z:
        wrapper = json.loads(str(z["__index__"]))
        index = wrapper["shards"]
        arrays = {e["key"]: z[e["key"]] for e in index}
    os.remove(src)
    half = len(index) // 2
    for pid, part in ((0, index[:half]), (1, index[half:])):
        np.savez(
            os.path.join(path, f"shards_p{pid}.npz"),
            __index__=json.dumps({"nonce": wrapper["nonce"],
                                  "shards": part}),
            **{e["key"]: arrays[e["key"]] for e in part},
        )

    got = try_resume(path, state)
    assert got is not None
    restored, meta = got
    assert meta["epoch"] == 2.0
    for a, b in zip(jax.tree_util.tree_leaves(state),
                    jax.tree_util.tree_leaves(restored)):
        if jax.dtypes.issubdtype(getattr(a, "dtype", np.float32),
                                 jax.dtypes.prng_key):
            a, b = jax.random.key_data(a), jax.random.key_data(b)
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_sharded_checkpoint_missing_shards_resume_fresh(tmp_path):
    """Incomplete sharded checkpoints (lost shard file) must make
    try_resume start fresh, not restore garbage."""
    import json

    import pytest

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 devices")
    from dgcnn_tpu.parallel.mesh import make_mesh
    from dgcnn_tpu.train.checkpoint import save_checkpoint_sharded

    mesh = make_mesh(n_data=4, n_points=2)
    state = _sharded_state(mesh)
    path = str(tmp_path / "ckpt3")
    save_checkpoint_sharded(path, state, epoch=1)
    src = _shard_file(path)
    with np.load(src, allow_pickle=False) as z:
        wrapper = json.loads(str(z["__index__"]))
        keep = wrapper["shards"][: len(wrapper["shards"]) // 2]
        new = os.path.join(os.path.dirname(src), "partial.npz")
        np.savez(new, __index__=json.dumps({"nonce": wrapper["nonce"],
                                            "shards": keep}),
                 **{e["key"]: z[e["key"]] for e in keep})
    os.replace(new, src)
    assert try_resume(path, state) is None


def test_sharded_checkpoint_rejects_stale_shards(tmp_path):
    """A re-save with fewer processes leaves stale shards_p*.npz from the
    old save; the loader must reject them (nonce mismatch) instead of
    silently mixing epochs — here the stale file would otherwise FULLY
    satisfy coverage with old data."""
    import json

    import pytest

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 devices")
    from dgcnn_tpu.parallel.mesh import make_mesh
    from dgcnn_tpu.train.checkpoint import (
        load_checkpoint_sharded,
        save_checkpoint_sharded,
    )

    mesh = make_mesh(n_data=4, n_points=2)
    state = _sharded_state(mesh)
    path = str(tmp_path / "ckpt_stale")
    save_checkpoint_sharded(path, state, epoch=1)
    # simulate the old save's file surviving under another process id
    os.rename(_shard_file(path), os.path.join(path, "shards_p7.npz"))
    import dataclasses

    state2 = dataclasses.replace(
        state, step=state.step + 41)  # new save: different content
    save_checkpoint_sharded(path, state2, epoch=2)
    got, meta = load_checkpoint_sharded(path, state2)
    assert meta["epoch"] == 2.0
    assert int(got.step) == int(state2.step)  # not the stale epoch-1 value


def test_file_to_sharded_dir_overwrite(tmp_path):
    """A single-file .npz checkpoint at ``path`` must not crash a later
    sharded (directory) save at the same path — the file->dir layout
    transition (the dir->file direction was already handled)."""
    from dgcnn_tpu.train.checkpoint import (
        load_checkpoint_sharded,
        save_checkpoint,
        save_checkpoint_sharded,
    )

    state = {"w": jnp.arange(8.0), "b": jnp.float32(3.0)}
    path = str(tmp_path / "ckpt_x")
    save_checkpoint(path, state, epoch=1)
    assert os.path.isfile(path)
    save_checkpoint_sharded(path, state, epoch=2)
    assert os.path.isdir(path)
    got, meta = load_checkpoint_sharded(path, state)
    assert meta["epoch"] == 2.0
    np.testing.assert_array_equal(np.asarray(got["w"]),
                                  np.asarray(state["w"]))


def test_single_file_restore_preserves_template_shardings(tmp_path):
    """load_checkpoint must place restored leaves on the TEMPLATE's
    shardings (a resumed tensor-parallel run would otherwise silently
    lose its NamedShardings and replicate the trunk)."""
    import pytest

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 devices")
    from jax.sharding import NamedSharding, PartitionSpec as P

    from dgcnn_tpu.parallel.mesh import make_mesh
    from dgcnn_tpu.train.checkpoint import load_checkpoint, save_checkpoint

    mesh = make_mesh(n_data=4, n_points=2)
    sh = NamedSharding(mesh, P(None, "points"))
    state = {
        "w": jax.device_put(jnp.arange(32.0).reshape(4, 8), sh),
        "b": jax.device_put(jnp.arange(4.0), NamedSharding(mesh, P())),
    }
    path = str(tmp_path / "tp.npz")
    save_checkpoint(path, state, epoch=1)
    got, _ = load_checkpoint(path, state)
    assert got["w"].sharding == sh
    np.testing.assert_array_equal(np.asarray(got["w"]),
                                  np.asarray(state["w"]))
