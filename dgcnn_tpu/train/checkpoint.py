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
        # dtype from the template WITHOUT np.asarray(want) — that would
        # device-to-host copy every leaf just to read .dtype (and break on
        # non-fully-addressable multi-process templates)
        dtype = getattr(want, "dtype", None) or np.asarray(want).dtype
        arr = jax.numpy.asarray(got, dtype=dtype)
        # preserve the template's placement: a resumed TP/DP run must get
        # its arrays back on the same NamedShardings (otherwise GSPMD is
        # free to replicate what the caller deliberately sharded)
        sharding = getattr(want, "sharding", None)
        if sharding is not None:
            if getattr(want, "is_fully_addressable", True):
                arr = jax.device_put(arr, sharding)
            else:
                arr = jax.make_array_from_callback(
                    tuple(ws), sharding,
                    lambda idx, got=got, dtype=dtype: np.asarray(
                        got[idx], dtype),
                )
        leaves.append(arr)
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
    try:
        if os.path.isfile(path):
            # overwrite semantics across layouts: an earlier single-file
            # .npz save lives here (the dir→file direction is handled in
            # save_checkpoint); every process may race on this — first
            # remove wins, the rest see a dir or nothing
            os.remove(path)
    except OSError:
        pass
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

    # nonce-suffixed shard names: a RE-save never overwrites the previous
    # checkpoint's files, so a crash mid-save (some processes written, no
    # new manifest yet) leaves the old manifest + old shard files intact
    # and fully loadable; stale files are cleaned only after the new
    # manifest is durable (loaders filter by manifest nonce anyway)
    shard_name = f"shards_p{pid}_{nonce}.npz"
    tmp = os.path.join(path, f".{shard_name}.tmp")
    with open(tmp, "wb") as f:
        np.savez(f, __index__=json.dumps({"nonce": nonce, "shards": index}),
                 **arrays)
    os.replace(tmp, os.path.join(path, shard_name))

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
    # the new checkpoint is durable: drop THIS process's stale shard files
    # from earlier saves (best-effort; loaders ignore them via the nonce)
    import glob as _glob

    for fp in _glob.glob(os.path.join(path, f"shards_p{pid}_*.npz")) + (
        [os.path.join(path, f"shards_p{pid}.npz")]
    ):
        if fp.endswith(f"_{nonce}.npz"):
            continue
        try:
            os.remove(fp)
        except OSError:
            pass


# Span accounting for the last load_checkpoint_sharded call: bytes of
# shard data actually decompressed vs the global byte size of all leaves.
# A scale-true restore on P processes loads ~global/P (+ replicated
# leaves), NOT ~global per process; tests assert on this.
LAST_RESTORE_STATS: dict[str, int] = {"loaded_bytes": 0, "global_bytes": 0}


def _scan_shard_indexes(path: str, want_nonce) -> dict[int, list]:
    """First pass over ``shards_p*.npz``: read only each file's
    ``__index__`` member. Returns leaf -> [(file, array_key, spans), ...].
    Shard files from a different save nonce are rejected (stale files from
    an earlier save with a different process count, or a crashed re-save —
    mixed-epoch state must never load silently)."""
    import glob as _glob

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
                    (fp, entry["key"], entry["index"])
                )
    return per_leaf


class _ShardReader:
    """Lazily opens shard files and decompresses only requested members,
    counting bytes (each member once)."""

    def __init__(self):
        self._files: dict[str, Any] = {}
        self._cache: dict[tuple[str, str], np.ndarray] = {}
        self.loaded_bytes = 0

    def get(self, fp: str, key: str) -> np.ndarray:
        ck = (fp, key)
        if ck not in self._cache:
            if fp not in self._files:
                self._files[fp] = np.load(fp, allow_pickle=False)
            data = self._files[fp][key]
            self.loaded_bytes += data.nbytes
            self._cache[ck] = data
        return self._cache[ck]

    def close(self):
        for z in self._files.values():
            z.close()


def _assemble_region(
    region: tuple, shape, dtype, entries, reader: _ShardReader, name: str
) -> np.ndarray:
    """Assemble the sub-array ``full[region]`` from the shard entries whose
    recorded global spans intersect it; raises on incomplete coverage."""
    rsl = tuple(
        slice(0 if s.start is None else int(s.start),
              dim if s.stop is None else int(s.stop))
        for s, dim in zip(region, shape)
    )
    rshape = tuple(s.stop - s.start for s in rsl)
    out = np.zeros(rshape, dtype)
    covered = np.zeros(rshape, bool)
    for fp, key, spans in entries:
        # intersect this shard's global span with the requested region
        dst, src, empty = [], [], False
        for (a, b), r in zip(spans, rsl):
            lo, hi = max(a, r.start), min(b, r.stop)
            if lo >= hi:
                empty = True
                break
            dst.append(slice(lo - r.start, hi - r.start))
            src.append(slice(lo - a, hi - a))
        if empty:
            continue
        data = reader.get(fp, key)
        out[tuple(dst)] = data[tuple(src)]
        covered[tuple(dst)] = True
    if not covered.all():
        raise ValueError(f"leaf {name}: missing shards "
                         f"({covered.mean():.0%} of region covered)")
    return out


def load_checkpoint_sharded(path: str, like: Any) -> tuple[Any, dict]:
    """Restore a pytree saved by :func:`save_checkpoint_sharded`.

    Scans the ``__index__`` of every ``shards_p*.npz`` present, then loads
    ONLY the global-span intersections this process's template shardings
    actually need (a leaf sharded over P processes costs ~1/P of its bytes
    per process, not the full array — the scale-true property an
    Orbax-style layout exists for; replicated leaves still load whole).
    Each assembled block is placed directly on its device via
    ``jax.make_array_from_callback`` on the ``like`` leaf's sharding, so a
    resumed run re-shards exactly as the template dictates — also across a
    different process count, as long as the whole directory is visible
    (shared filesystem). Raises FileNotFoundError / ValueError on missing
    or incompatible checkpoints (try_resume relies on this).
    """
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
    per_leaf = _scan_shard_indexes(path, manifest.get("nonce"))
    reader = _ShardReader()
    global_bytes = 0
    try:
        leaves_out = []
        for i, (meta, want) in enumerate(zip(manifest["leaves"], flat)):
            shape = tuple(meta["shape"])
            dtype = np.dtype(meta["dtype"])
            global_bytes += int(np.prod(shape, dtype=np.int64)) * dtype.itemsize
            want_raw = (jax.random.key_data(want) if _is_prng_key(want)
                        else want)
            if tuple(np.shape(want_raw)) != shape:
                raise ValueError(
                    f"leaf {meta['name']}: checkpoint {shape} vs "
                    f"{np.shape(want_raw)}"
                )
            entries = per_leaf.get(i, ())
            sharding = getattr(want_raw, "sharding", None)
            if sharding is None or meta["is_key"] or not shape:
                # no template sharding to be lazy against (host arrays,
                # PRNG keys, scalars): assemble whole. Placement still goes
                # through make_array_from_callback — device_put cannot
                # target multi-process (non-addressable) shardings.
                full = _assemble_region(
                    tuple(slice(None) for _ in shape), shape, dtype,
                    entries, reader, meta["name"],
                )
                if sharding is not None:
                    arr = jax.make_array_from_callback(
                        shape, sharding, lambda idx, full=full: full[idx])
                else:
                    arr = jax.numpy.asarray(full)
                if meta["is_key"]:
                    arr = jax.random.wrap_key_data(arr)
                leaves_out.append(arr)
                continue

            blocks: dict[tuple, np.ndarray] = {}

            def _block(index, shape=shape, dtype=dtype, entries=entries,
                       name=meta["name"], blocks=blocks):
                key = tuple(
                    (0 if s.start is None else int(s.start),
                     dim if s.stop is None else int(s.stop))
                    for s, dim in zip(index, shape)
                )
                if key not in blocks:  # replicated devices share one block
                    blocks[key] = _assemble_region(
                        index, shape, dtype, entries, reader, name)
                return blocks[key]

            arr = jax.make_array_from_callback(shape, sharding, _block)
            leaves_out.append(arr)
    finally:
        reader.close()
    LAST_RESTORE_STATS["loaded_bytes"] = reader.loaded_bytes
    LAST_RESTORE_STATS["global_bytes"] = global_bytes
    return (jax.tree_util.tree_unflatten(treedef, leaves_out),
            manifest["metadata"])


def _read_sharded_arrays(path: str) -> dict[str, np.ndarray]:
    """Reassemble every leaf of a sharded checkpoint directory into host
    numpy arrays keyed by recorded leaf name (nonce-validated, coverage-
    checked) — the directory counterpart of reading all leaf_{i} arrays.
    (Full assembly by contract — used by eval/predict which need whole
    weights; the resume path uses the span-lazy loader above.)"""
    man_path = os.path.join(path, "manifest.json")
    if not os.path.exists(man_path):
        raise FileNotFoundError(man_path)
    with open(man_path) as f:
        manifest = json.load(f)
    per_leaf = _scan_shard_indexes(path, manifest.get("nonce"))
    reader = _ShardReader()
    try:
        out = {}
        for i, meta in enumerate(manifest["leaves"]):
            shape = tuple(meta["shape"])
            out[meta["name"]] = _assemble_region(
                tuple(slice(None) for _ in shape), shape,
                np.dtype(meta["dtype"]), per_leaf.get(i, ()), reader,
                meta["name"],
            )
    finally:
        reader.close()
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
