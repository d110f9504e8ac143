"""Spatial tiling: sweep/sample fixed-size XY windows over a point cloud.

Reference: ``room2blocks`` (/root/reference/prepare_data/
pointcloud_util.py:97-192) and its subsamplers (:62-94). Behaviourally
equivalent (grid sweep with stride, random window sampling with the
<1000-point rejection rule, cap-or-duplicate to ``num_point``), but
vectorised: window membership tests use a presorted x-order and
``searchsorted`` to cut each candidate column slab before the y test,
instead of full-cloud boolean masks per window.
"""

from __future__ import annotations

import numpy as np

MIN_BLOCK_POINTS = 1000  # reference rejection threshold (pointcloud_util.py:162)


def sample_data(
    data: np.ndarray, num_sample: int, rng: np.random.Generator
) -> tuple[np.ndarray, np.ndarray]:
    """Subsample down (WITHOUT replacement) or duplicate up to exactly
    num_sample (/root/reference/prepare_data/pointcloud_util.py:62-78).

    Deliberate deviation (DESIGN.md tail): the reference's down-sampling
    draw uses np.random.choice with replacement (pointcloud_util.py:73),
    which discards extra points by duplicating others inside an
    oversampled block; without replacement every kept point is distinct —
    strictly more information per block, same block-size contract."""
    n = data.shape[0]
    if n == num_sample:
        return data, np.arange(n)
    if n > num_sample:
        sel = rng.choice(n, num_sample, replace=False)
        return data[sel], sel
    extra = rng.choice(n, num_sample - n)
    idx = np.concatenate([np.arange(n), extra])
    return data[idx], idx


def sample_data_label(data, label, num_sample, rng):
    new_data, idx = sample_data(data, num_sample, rng)
    return new_data, label[idx]


class _XYIndex:
    """Sorted-x index for fast axis-aligned window queries.

    The stable x argsort is the hottest single op of the predict() block
    stage at production tile sizes (~62 of 93 ms at 400k pts — scripts/
    exp_load_chain_profile.py); the native radix argsort produces the
    IDENTICAL permutation ~4x faster (numpy fallback off-build)."""

    def __init__(self, xy: np.ndarray):
        from dgcnn_tpu.prepare.dtm import native_argsort_f64

        order = native_argsort_f64(xy[:, 0])
        if order is None:
            order = np.argsort(xy[:, 0], kind="stable")
        self.order = order
        self.xs = xy[self.order, 0]
        self.ys = xy[self.order, 1]

    def window(self, x0, x1, y0, y1) -> np.ndarray:
        lo = np.searchsorted(self.xs, x0, "left")
        hi = np.searchsorted(self.xs, x1, "right")
        slab = slice(lo, hi)
        ys = self.ys[slab]
        keep = (ys >= y0) & (ys <= y1)
        return self.order[slab][keep]


def room2blocks(
    data: np.ndarray,
    label: np.ndarray,
    num_point: int,
    block_size: float = 100.0,
    stride: float = 50.0,
    random_sample: bool = False,
    sample_num: int | None = None,
    use_all_points: bool = False,
    rng: np.random.Generator | None = None,
    min_points: int = MIN_BLOCK_POINTS,
    return_indices: bool = False,
):
    """Tile a cloud into (sub)blocks.

    Grid mode sweeps window origins at ``stride``; random mode draws
    ``sample_num`` origins uniformly, redrawing windows with fewer than
    ``min_points`` points (bounded retries instead of the reference's
    unbounded while-loop, pointcloud_util.py:156-166).

    Returns:
        use_all_points=False: (B, num_point, F) array + (B, num_point) labels.
        use_all_points=True: two object arrays of ragged per-block data.
        return_indices=True: the per-block ROW INDICES into ``data`` instead
            of copies — (B, num_point) int array, or an object array of
            ragged index arrays with use_all_points. Selection is xy-only,
            so callers can compute indices while other per-point columns
            (e.g. AGL) are still being filled in (eval/predict.py overlap).
    """
    if stride > block_size:
        raise ValueError("stride must be <= block_size")
    rng = rng or np.random.default_rng(0)
    label = np.asarray(label)
    x_lb, x_ub = float(np.min(data[:, 0])), float(np.max(data[:, 0]))
    y_lb, y_ub = float(np.min(data[:, 1])), float(np.max(data[:, 1]))
    index = _XYIndex(data[:, :2])

    origins: list[tuple[float, float]] = []
    if not random_sample:
        nx = int(np.ceil(((x_ub - x_lb) - block_size) / stride)) + 1
        ny = int(np.ceil(((y_ub - y_lb) - block_size) / stride)) + 1
        for i in range(max(nx, 1)):
            for j in range(max(ny, 1)):
                origins.append((x_lb + i * stride, y_lb + j * stride))
    else:
        if sample_num is None:
            nx = int(np.ceil((x_ub - x_lb) / block_size))
            ny = int(np.ceil((y_ub - y_lb) / block_size))
            sample_num = max(nx * ny, 1)
        tries = 0
        while len(origins) < sample_num and tries < sample_num * 50:
            xbeg = rng.uniform(x_lb, x_ub)
            ybeg = rng.uniform(y_lb, y_ub)
            sel = index.window(xbeg, xbeg + block_size, ybeg, ybeg + block_size)
            tries += 1
            if len(sel) >= min_points:
                origins.append((xbeg, ybeg))

    blocks_d, blocks_l, blocks_i = [], [], []
    for xbeg, ybeg in origins:
        sel = index.window(xbeg, xbeg + block_size, ybeg, ybeg + block_size)
        if len(sel) < min_points:
            continue
        if use_all_points:
            if return_indices:
                blocks_i.append(sel)
            else:
                blocks_d.append(data[sel])
                blocks_l.append(label[sel])
        else:
            # draw the subsample on INDICES so the rng sequence is
            # identical with and without return_indices
            _, sub = sample_data(sel[:, None], num_point, rng)
            if return_indices:
                blocks_i.append(sel[sub][None])
            else:
                blocks_d.append(data[sel[sub]][None])
                blocks_l.append(label[sel[sub]][None])

    if return_indices:
        if use_all_points:
            oi = np.empty(len(blocks_i), object)
            for i, v in enumerate(blocks_i):
                oi[i] = v
            return oi
        if not blocks_i:
            return np.zeros((0, num_point), np.int64)
        return np.concatenate(blocks_i, 0)
    if not blocks_d:
        f = data.shape[1]
        if use_all_points:
            return (np.empty(0, object), np.empty(0, object))
        return (np.zeros((0, num_point, f)), np.zeros((0, num_point)))
    if use_all_points:
        od = np.empty(len(blocks_d), object)
        ol = np.empty(len(blocks_l), object)
        for i, (d, l) in enumerate(zip(blocks_d, blocks_l)):
            od[i], ol[i] = d, l
        return od, ol
    return np.concatenate(blocks_d, 0), np.concatenate(blocks_l, 0)
