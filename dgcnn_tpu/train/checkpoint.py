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


def try_resume(path: str, like: Any):
    """Opportunistic resume (reference try/except semantics,
    /root/reference/train.py:127-138): returns (state, metadata) or None."""
    try:
        return load_checkpoint(path, like)
    except FileNotFoundError:
        return None
    except Exception as e:  # corrupt/incompatible — restart from scratch
        print(f"checkpoint {path} unusable ({type(e).__name__}: {e}); "
              "starting fresh", file=sys.stderr)
        return None


def load_named_subtrees(path: str, subtrees: dict[str, Any]) -> dict[str, Any]:
    """Restore selected top-level TrainState fields by leaf name.

    ``subtrees`` maps a top-level field name (e.g. 'params', 'bn_state') to
    a template pytree; leaves are matched by their recorded name prefix, so
    the optimizer state (whose structure depends on the training-time
    optimizer) need not be reconstructible — eval/predict only need model
    weights and BN statistics.
    """
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
