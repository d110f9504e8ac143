"""Checkpointing: full-train-state save/restore with the reference's
best-only policy and epoch-resume semantics.

Reference: torch pickle of {'epoch', 'mBPCA', model/optimizer/scheduler
state dicts}, saved only on validation balanced-accuracy improvement and
resumed opportunistically (/root/reference/train.py:127-138, :301-312).

Format here: one ``.npz`` holding every flattened pytree leaf plus a JSON
sidecar of tree structure and scalar metadata — dependency-free,
deterministic, and loadable without the framework (plain numpy). Loading a
reference ``.t7`` transparently falls back to the torch converter
(dgcnn_tpu.compat), so reference-trained checkpoints drop in.
"""

from __future__ import annotations

import json
import os
import sys
import time
from typing import Any

import jax
import numpy as np


def _is_prng_key(leaf) -> bool:
    try:
        return jax.dtypes.issubdtype(leaf.dtype, jax.dtypes.prng_key)
    except Exception:
        return False


def _flatten_with_names(tree: Any) -> list[tuple[str, np.ndarray, bool]]:
    flat, _ = jax.tree_util.tree_flatten_with_path(tree)
    out = []
    for path, leaf in flat:
        name = "/".join(str(getattr(p, "key", getattr(p, "idx", p))) for p in path)
        if _is_prng_key(leaf):
            out.append((name, np.asarray(jax.random.key_data(leaf)), True))
        else:
            out.append((name, np.asarray(leaf), False))
    return out


def save_checkpoint(path: str, state: Any, **metadata: float) -> None:
    """Save a pytree ``state`` (+ scalar metadata) to ``path`` (.npz).
    Typed PRNG-key leaves are stored as their raw key data."""
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    if os.path.isdir(path):
        # overwrite semantics across layouts: a previous multi-process run
        # left a sharded DIRECTORY here; os.replace(file, dir) would fail
        import shutil

        shutil.rmtree(path)
    leaves = _flatten_with_names(state)
    arrays = {f"leaf_{i}": arr for i, (_, arr, _) in enumerate(leaves)}
    manifest = {
        "names": [n for n, _, _ in leaves],
        "is_key": [k for _, _, k in leaves],
        "metadata": {k: float(v) for k, v in metadata.items()},
    }
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        np.savez(f, __manifest__=json.dumps(manifest), **arrays)
    os.replace(tmp, path)  # atomic: a crash never corrupts the checkpoint


def load_checkpoint(path: str, like: Any) -> tuple[Any, dict[str, float]]:
    """Restore a pytree with the structure of ``like`` from ``path``.

    Returns (state, metadata). Raises FileNotFoundError/ValueError on
    missing or structurally incompatible files.
    """
    with np.load(path, allow_pickle=False) as z:
        manifest = json.loads(str(z["__manifest__"]))
        arrays = [z[f"leaf_{i}"] for i in range(len(manifest["names"]))]
    is_key = manifest.get("is_key", [False] * len(arrays))
    flat, treedef = jax.tree_util.tree_flatten(like)
    if len(flat) != len(arrays):
        raise ValueError(
            f"checkpoint has {len(arrays)} leaves, expected {len(flat)}"
        )
    leaves = []
    for want, got, key in zip(flat, arrays, is_key):
        if key:
            leaves.append(jax.random.wrap_key_data(jax.numpy.asarray(got)))
            continue
        ws = np.shape(want)
        if tuple(ws) != tuple(got.shape):
            raise ValueError(
                f"leaf shape mismatch: checkpoint {got.shape} vs {ws}"
            )
        leaves.append(jax.numpy.asarray(got, dtype=np.asarray(want).dtype))
    return jax.tree_util.tree_unflatten(treedef, leaves), manifest["metadata"]


def save_checkpoint_auto(path: str, state: Any, **metadata: float) -> None:
    """Dispatch save: the single-file .npz on one process, the sharded
    directory layout whenever more than one process holds the state (each
    host persists only its local shards — required correctness for
    multi-host training, SURVEY.md §5). ``try_resume``/``load`` dispatch on
    the resulting layout automatically."""
    if jax.process_count() > 1:
        save_checkpoint_sharded(path, state, **metadata)
    else:
        save_checkpoint(path, state, **metadata)


def try_resume(path: str, like: Any):
    """Opportunistic resume (reference try/except semantics,
    /root/reference/train.py:127-138): returns (state, metadata) or None.
    Dispatches on layout: a directory is a sharded checkpoint
    (:func:`save_checkpoint_sharded`), a file the single-host .npz."""
    try:
        if os.path.isdir(path):
            return load_checkpoint_sharded(path, like)
        return load_checkpoint(path, like)
    except FileNotFoundError:
        return None
    except Exception as e:  # corrupt/incompatible — restart from scratch
        print(f"checkpoint {path} unusable ({type(e).__name__}: {e}); "
              "starting fresh", file=sys.stderr)
        return None


# --------------------------------------------------------------------------
# Sharded (multi-host-ready) checkpointing — SURVEY.md §5: "Orbax-style
# sharded array checkpoints". Layout: a DIRECTORY holding one
# ``shards_p{pid}.npz`` per process plus a ``manifest.json`` (tree names,
# global shapes, per-shard index map, scalar metadata). Each process writes
# only the array shards it owns (``shard.replica_id == 0`` dedupes
# replicated leaves); restore reassembles global arrays on the template's
# shardings from whichever shard files are visible, so a single-process
# restart can read a checkpoint written by many processes as long as it
# sees the whole directory (shared filesystem, as with orbax).


def _slices_to_json(idx: tuple, shape: tuple[int, ...]) -> list:
    out = []
    for sl, dim in zip(idx, shape):
        start = 0 if sl.start is None else int(sl.start)
        stop = dim if sl.stop is None else int(sl.stop)
        out.append([start, stop])
    return out


def _json_to_slices(spans: list) -> tuple:
    return tuple(slice(a, b) for a, b in spans)


def save_checkpoint_sharded(path: str, state: Any, **metadata: float) -> None:
    """Save a (possibly sharded) pytree to directory ``path``.

    Works with fully-addressable arrays (single process: everything) and
    multi-process jax.Arrays (each process persists only the local shards
    it owns). Each shard file carries its own ``__index__`` (array key ->
    leaf number + global-index spans), so the loader needs no global
    coordination metadata. Every file is written atomically; process 0
    writes the manifest last, so a crashed writer never leaves a
    loadable-looking but incomplete checkpoint.
    """
    pid, n_proc = jax.process_index(), jax.process_count()
    os.makedirs(path, exist_ok=True)
    # save nonce: every shard file and the manifest carry it, so a restore
    # can reject stale shards_p*.npz left behind by an earlier save with a
    # different process count or a crashed re-save (mixed-epoch state must
    # never load silently). All processes must agree on it — derive it from
    # process 0's clock via broadcast when distributed.
    nonce = np.int64(time.time_ns())
    if n_proc > 1:
        from jax.experimental import multihost_utils

        nonce = np.int64(
            np.asarray(multihost_utils.broadcast_one_to_all(nonce))
        )
    nonce = int(nonce)
    flat, _ = jax.tree_util.tree_flatten_with_path(state)
    leaves_meta = []
    arrays: dict[str, np.ndarray] = {}
    index: list[dict] = []
    for i, (p, leaf) in enumerate(flat):
        name = "/".join(str(getattr(q, "key", getattr(q, "idx", q)))
                        for q in p)
        is_key = _is_prng_key(leaf)
        raw = jax.numpy.asarray(
            jax.random.key_data(leaf) if is_key else leaf
        )
        leaves_meta.append({
            "name": name,
            "is_key": bool(is_key),
            "shape": list(raw.shape),
            "dtype": str(raw.dtype),
        })
        for j, sh in enumerate(getattr(raw, "addressable_shards", ())):
            if sh.replica_id != 0:  # replicated copy — another file owns it
                continue
            akey = f"leaf{i}_s{j}"
            arrays[akey] = np.asarray(sh.data)
            index.append({
                "key": akey,
                "leaf": i,
                "index": _slices_to_json(sh.index, raw.shape),
            })

    tmp = os.path.join(path, f".shards_p{pid}.npz.tmp")
    with open(tmp, "wb") as f:
        np.savez(f, __index__=json.dumps({"nonce": nonce, "shards": index}),
                 **arrays)
    os.replace(tmp, os.path.join(path, f"shards_p{pid}.npz"))

    if n_proc > 1:  # every shard file must exist before the manifest
        from jax.experimental import multihost_utils

        multihost_utils.sync_global_devices("dgcnn_ckpt_shards_written")
    if pid == 0:
        manifest = {
            "leaves": leaves_meta,
            "n_processes": n_proc,
            "nonce": nonce,
            "metadata": {k: float(v) for k, v in metadata.items()},
        }
        tmp = os.path.join(path, ".manifest.json.tmp")
        with open(tmp, "w") as f:
            json.dump(manifest, f)
        os.replace(tmp, os.path.join(path, "manifest.json"))
    if n_proc > 1:
        # no process may return (and e.g. try to restore) before the
        # manifest exists — save() returning means the checkpoint is whole
        from jax.experimental import multihost_utils

        multihost_utils.sync_global_devices("dgcnn_ckpt_manifest_written")


def load_checkpoint_sharded(path: str, like: Any) -> tuple[Any, dict]:
    """Restore a pytree saved by :func:`save_checkpoint_sharded`.

    Scans every ``shards_p*.npz`` present in the directory, reassembles
    each leaf from the recorded global-index spans, verifies full coverage,
    and places the result on the corresponding ``like`` leaf's sharding
    (so a resumed run re-shards exactly as the template dictates — also
    across a different process count, as long as the whole directory is
    visible, e.g. on a shared filesystem). Raises FileNotFoundError /
    ValueError on missing or incompatible checkpoints (try_resume relies
    on this).
    """
    import glob as _glob

    man_path = os.path.join(path, "manifest.json")
    if not os.path.exists(man_path):
        raise FileNotFoundError(man_path)
    with open(man_path) as f:
        manifest = json.load(f)
    flat, treedef = jax.tree_util.tree_flatten(like)
    if len(flat) != len(manifest["leaves"]):
        raise ValueError(
            f"checkpoint has {len(manifest['leaves'])} leaves, "
            f"expected {len(flat)}"
        )
    # collect (spans, data) per leaf from shard files carrying THIS save's
    # nonce — stale files from an earlier save (different process count, or
    # a crashed re-save) are rejected, and the coverage check below then
    # refuses the incomplete checkpoint instead of silently mixing epochs
    want_nonce = manifest.get("nonce")
    per_leaf: dict[int, list] = {}
    for fp in sorted(_glob.glob(os.path.join(path, "shards_p*.npz"))):
        with np.load(fp, allow_pickle=False) as z:
            idx = json.loads(str(z["__index__"]))
            if isinstance(idx, dict):  # nonce-carrying format
                if want_nonce is not None and idx.get("nonce") != want_nonce:
                    continue
                entries = idx["shards"]
            else:  # legacy format (no nonce)
                entries = idx
            for entry in entries:
                per_leaf.setdefault(entry["leaf"], []).append(
                    (entry["index"], z[entry["key"]])
                )

    leaves_out = []
    for i, (meta, want) in enumerate(zip(manifest["leaves"], flat)):
        shape = tuple(meta["shape"])
        want_raw = jax.random.key_data(want) if _is_prng_key(want) else want
        if tuple(np.shape(want_raw)) != shape:
            raise ValueError(
                f"leaf {meta['name']}: checkpoint {shape} vs "
                f"{np.shape(want_raw)}"
            )
        full = np.zeros(shape, dtype=np.dtype(meta["dtype"]))
        covered = np.zeros(shape, dtype=bool)
        for spans, data in per_leaf.get(i, ()):
            sl = _json_to_slices(spans)
            full[sl] = data
            covered[sl] = True
        if not covered.all():
            raise ValueError(f"leaf {meta['name']}: missing shards "
                             f"({covered.mean():.0%} covered)")
        arr = jax.numpy.asarray(full)
        sharding = getattr(want, "sharding", None)
        if sharding is not None:
            arr = jax.device_put(arr, sharding)
        if meta["is_key"]:
            arr = jax.random.wrap_key_data(arr)
        leaves_out.append(arr)
    return (jax.tree_util.tree_unflatten(treedef, leaves_out),
            manifest["metadata"])


def _read_sharded_arrays(path: str) -> dict[str, np.ndarray]:
    """Reassemble every leaf of a sharded checkpoint directory into host
    numpy arrays keyed by recorded leaf name (nonce-validated, coverage-
    checked) — the directory counterpart of reading all leaf_{i} arrays."""
    import glob as _glob

    man_path = os.path.join(path, "manifest.json")
    if not os.path.exists(man_path):
        raise FileNotFoundError(man_path)
    with open(man_path) as f:
        manifest = json.load(f)
    want_nonce = manifest.get("nonce")
    per_leaf: dict[int, list] = {}
    for fp in sorted(_glob.glob(os.path.join(path, "shards_p*.npz"))):
        with np.load(fp, allow_pickle=False) as z:
            idx = json.loads(str(z["__index__"]))
            if isinstance(idx, dict):
                if want_nonce is not None and idx.get("nonce") != want_nonce:
                    continue
                entries = idx["shards"]
            else:
                entries = idx
            for entry in entries:
                per_leaf.setdefault(entry["leaf"], []).append(
                    (entry["index"], z[entry["key"]])
                )
    out = {}
    for i, meta in enumerate(manifest["leaves"]):
        shape = tuple(meta["shape"])
        full = np.zeros(shape, dtype=np.dtype(meta["dtype"]))
        covered = np.zeros(shape, dtype=bool)
        for spans, data in per_leaf.get(i, ()):
            sl = _json_to_slices(spans)
            full[sl] = data
            covered[sl] = True
        if not covered.all():
            raise ValueError(f"leaf {meta['name']}: missing shards")
        out[meta["name"]] = full
    return out


def load_named_subtrees(path: str, subtrees: dict[str, Any]) -> dict[str, Any]:
    """Restore selected top-level TrainState fields by leaf name.

    ``subtrees`` maps a top-level field name (e.g. 'params', 'bn_state') to
    a template pytree; leaves are matched by their recorded name prefix, so
    the optimizer state (whose structure depends on the training-time
    optimizer) need not be reconstructible — eval/predict only need model
    weights and BN statistics. Accepts both the single-file .npz and the
    sharded directory layout (multi-process-trained models evaluate and
    predict like any other).
    """
    if os.path.isdir(path):
        arrays = _read_sharded_arrays(path)
    else:
        with np.load(path, allow_pickle=False) as z:
            manifest = json.loads(str(z["__manifest__"]))
            arrays = {n: z[f"leaf_{i}"]
                      for i, n in enumerate(manifest["names"])}

    def norm(name: str) -> str:
        return name.lstrip(".")

    by_name = {norm(n): a for n, a in arrays.items()}
    out = {}
    for field, template in subtrees.items():
        flat, treedef = jax.tree_util.tree_flatten_with_path(template)
        leaves = []
        for p, want in flat:
            name = field + "/" + "/".join(
                str(getattr(q, "key", getattr(q, "idx", q))) for q in p
            )
            if name not in by_name:
                raise KeyError(f"checkpoint {path} has no leaf {name!r}")
            got = by_name[name]
            if tuple(np.shape(want)) != tuple(got.shape):
                raise ValueError(
                    f"leaf {name}: checkpoint {got.shape} vs "
                    f"{np.shape(want)}"
                )
            leaves.append(jax.numpy.asarray(got))
        out[field] = jax.tree_util.tree_unflatten(
            jax.tree_util.tree_structure(template), leaves
        )
    return out


def load_model_checkpoint(path: str):
    """Load model params/bn-state from either a dgcnn_tpu ``.npz`` (returns
    raw dict trees) or a reference torch ``.t7`` via dgcnn_tpu.compat."""
    if path.endswith(".t7") or path.endswith(".pt") or path.endswith(".pth"):
        from dgcnn_tpu.compat.torch_ckpt import load_torch_checkpoint

        return load_torch_checkpoint(path)
    raise ValueError(
        "use load_checkpoint(path, like=...) for dgcnn_tpu checkpoints; "
        "only torch .t7/.pt files load without a template"
    )
