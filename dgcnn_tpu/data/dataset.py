"""Room-store dataset over preprocessed ``Area_*.npy`` files.

Reference: ``FugroDataset`` (/root/reference/data.py:28-166) +
``collate_pcs`` (data.py:169-182). Differences (intended-semantics policy,
documented):

* the train/validation room split is drawn from a seeded PRNG instead of
  the unseeded global RNG, and splits by room *index* (the reference
  matched index substrings against file names, data.py:53-57);
* rooms may have different point counts (the reference required identical
  counts to stack, data.py:73-74);
* batches are fixed-shape: each sample is drawn to exactly ``num_point``
  points by the weighted sampler, so no runtime truncation is needed. A
  ``collate`` helper with the reference's truncate-to-min behaviour plus a
  pad+valid-mask mode exists for ``use_all_points`` workflows (XLA needs
  static shapes; padding with a validity mask replaces ragged batches).
"""

from __future__ import annotations

import os
from dataclasses import dataclass
from typing import Iterator, Sequence

import numpy as np

from dgcnn_tpu.data.sampling import create_train_mask, sample_point_indices


@dataclass
class Batch:
    """One fixed-shape training batch (host numpy; feed via device_put)."""

    points: np.ndarray   # (B, N, F) float32
    labels: np.ndarray   # (B, N) int32
    mask: np.ndarray     # (B, N) float32 — loss mask (class balancing × validity)
    room_idx: np.ndarray  # (B,) int32


class FugroDataset:
    """Loads every ``Area_*`` .npy room (last column = label) from a dir.

    Args mirror /root/reference/data.py:42-57 with an explicit seed.
    ``split``: 'train' keeps rooms outside the validation draw; any other
    value ('validation'/'test') keeps the drawn rooms — matching the
    reference's behaviour where any non-'train' split selects the
    validation partition (data.py:54-57).
    """

    def __init__(
        self,
        split: str = "train",
        data_root: str = "",
        num_point: int = 4096,
        use_all_points: bool = False,
        validation_prop: float = 0.2,
        classes: Sequence[int] = (0, 1, 2, 3, 4),
        seed: int = 1,
        sort_points: bool = True,
    ):
        self.split = split
        self.num_point = num_point
        self.use_all_points = use_all_points
        # In-block point ORDER is semantically free (kNN, BN, loss and
        # metrics are permutation-equivariant up to distance ties), so we
        # pick the fastest one for the TPU: x-sorted points give the
        # EdgeConv neighbour gathers spatially local rows (~15% faster
        # forward at the production shape). The reference samples in
        # random order (/root/reference/data.py:146-163); set
        # sort_points=False for that layout.
        self.sort_points = sort_points
        self.classes = list(classes)
        self.num_classes = len(self.classes)
        self.seed = seed
        self.rng = np.random.default_rng(seed + (0 if split == "train" else 1))

        rooms = sorted(
            f for f in os.listdir(data_root) if "Area_" in f and f.endswith(".npy")
        )
        if not rooms:
            raise FileNotFoundError(f"no Area_*.npy rooms under {data_root!r}")
        split_rng = np.random.default_rng(seed)
        n_val = int(np.floor(len(rooms) * validation_prop))
        val_idx = set(
            split_rng.choice(len(rooms), n_val, replace=False).tolist()
        )
        if split == "train":
            chosen = [r for i, r in enumerate(rooms) if i not in val_idx]
        else:
            chosen = [rooms[i] for i in sorted(val_idx)]
        if not chosen:
            raise ValueError(
                f"split {split!r} selected 0 of {len(rooms)} rooms "
                f"(validation_prop={validation_prop})"
            )

        self.room_names: list[str] = []
        self.room_points: list[np.ndarray] = []
        self.room_labels: list[np.ndarray] = []
        self.room_coord_min: list[np.ndarray] = []
        self.room_coord_max: list[np.ndarray] = []
        for name in chosen:
            data = np.load(os.path.join(data_root, name))
            pts, labels = data[:, :-1], data[:, -1]
            self.room_names.append(name)
            self.room_points.append(np.ascontiguousarray(pts, np.float32))
            self.room_labels.append(labels.astype(np.int32))
            self.room_coord_min.append(pts[:, :3].min(axis=0))
            self.room_coord_max.append(pts[:, :3].max(axis=0))
        self.room_idxs = np.arange(len(chosen))

    def __len__(self) -> int:
        return len(self.room_idxs)

    @property
    def num_features(self) -> int:
        return self.room_points[0].shape[1]

    def __getitem__(self, idx: int) -> tuple[np.ndarray, np.ndarray, int]:
        """Weighted subsample of one room → (points (n,F), labels (n,), idx)
        (/root/reference/data.py:146-163)."""
        pts = self.room_points[idx]
        labels = self.room_labels[idx]
        n = len(pts) if self.use_all_points else self.num_point
        sel = sample_point_indices(self.rng, labels, self.num_classes, n)
        if self.sort_points:
            sel = sel[np.argsort(pts[sel, 0], kind="stable")]
        return pts[sel], labels[sel], idx

    def sample_mask(
        self, labels: np.ndarray, exclude_classes: tuple[int, ...] = ()
    ) -> np.ndarray:
        """Class-balancing loss mask for a sampled label vector."""
        return create_train_mask(
            self.rng, labels, self.num_classes, exclude_classes
        )

    def batches(
        self,
        batch_size: int,
        *,
        shuffle: bool = True,
        drop_last: bool = True,
        with_mask: bool = True,
        exclude_classes: tuple[int, ...] = (),
        epoch: int = 0,
        pad_multiple: int | None = None,
    ) -> Iterator[Batch]:
        """Epoch iterator of fixed-shape batches.

        Deterministic given (seed, epoch). Each sample re-draws its points
        per epoch, like a fresh ``__getitem__`` pass through a DataLoader
        (/root/reference/train.py:79-97). ``pad_multiple`` buckets ragged
        ``use_all_points`` batch shapes (defaults to 512 in that mode) so
        XLA compiles a handful of shapes instead of one per batch.
        """
        if pad_multiple is None:
            pad_multiple = 512 if self.use_all_points else 1
        order = np.arange(len(self))
        # stable split token — NOT hash(str), which is salted per
        # interpreter (PYTHONHASHSEED) and would make batch order (and
        # every downstream self.rng draw) differ between runs/processes
        split_token = 0 if self.split == "train" else 1
        epoch_rng = np.random.default_rng((self.seed, epoch, split_token))
        if shuffle:
            epoch_rng.shuffle(order)
        for start in range(0, len(order), batch_size):
            sel = order[start : start + batch_size]
            if len(sel) < batch_size and drop_last:
                break
            pts, labels, masks, idxs = [], [], [], []
            for i in sel:
                p, l, idx = self[int(i)]
                pts.append(p)
                labels.append(l)
                idxs.append(idx)
                if with_mask:
                    masks.append(self.sample_mask(l, exclude_classes))
            batch_pts, batch_labels, valid = collate(pts, labels, mode="pad", pad_multiple=pad_multiple)
            if with_mask:
                m, _, _ = collate(
                    [mm[:, None] for mm in masks], labels, mode="pad", pad_multiple=pad_multiple
                )
                mask = m[..., 0] * valid
            else:
                mask = valid
            yield Batch(
                points=batch_pts,
                labels=batch_labels,
                mask=mask.astype(np.float32),
                room_idx=np.asarray(idxs, np.int32),
            )


def collate_pcs(data):
    """Reference-signature collation (/root/reference/data.py:169-182):
    takes [(points, labels, idx), ...] samples, truncates every sample to
    the batch minimum point count by random subsampling. Returns numpy
    (the reference returned torch tensors)."""
    points, labels, idxs = zip(*data)
    p, l, _ = collate(list(points), list(labels), mode="truncate")
    return p, l, np.asarray(idxs)


def collate(
    points: list[np.ndarray],
    labels: list[np.ndarray],
    mode: str = "pad",
    rng: np.random.Generator | None = None,
    pad_multiple: int = 1,
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Batch ragged samples into one fixed-shape array.

    mode='truncate' reproduces /root/reference/data.py:169-182 (random
    subsample of every sample down to the smallest count — changes batch
    statistics). mode='pad' (default) pads to the largest count by
    repeating each sample's first point and returns a validity mask —
    the XLA-friendly lossless choice. ``pad_multiple`` rounds the padded
    size up (e.g. 512) so ragged use_all_points batches hit few distinct
    XLA shapes instead of recompiling per batch.

    Returns (points (B,N,F) f32, labels (B,N) i32, valid (B,N) f32).
    """
    sizes = [len(p) for p in points]
    b = len(points)
    f = points[0].shape[1]
    if mode == "truncate":
        n = min(sizes)
        rng = rng or np.random.default_rng(0)
        out_p = np.zeros((b, n, f), np.float32)
        out_l = np.zeros((b, n), np.int32)
        for i, (p, l) in enumerate(zip(points, labels)):
            sel = rng.choice(len(p), n, replace=False)
            out_p[i] = p[sel]
            out_l[i] = l[sel]
        return out_p, out_l, np.ones((b, n), np.float32)
    if mode != "pad":
        raise ValueError(f"unknown collate mode {mode!r}")
    n = max(sizes)
    n = -(-n // pad_multiple) * pad_multiple
    out_p = np.zeros((b, n, f), np.float32)
    out_l = np.zeros((b, n), np.int32)
    valid = np.zeros((b, n), np.float32)
    for i, (p, l) in enumerate(zip(points, labels)):
        out_p[i, : len(p)] = p
        out_l[i, : len(l)] = l
        valid[i, : len(p)] = 1.0
        if len(p) < n:  # pad with the first point (harmless for kNN stats)
            out_p[i, len(p) :] = p[0]
            out_l[i, len(l) :] = l[0]
    return out_p, out_l, valid
