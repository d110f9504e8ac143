"""Fused native tile load — the whole host side of predict()'s load
stage in ONE ctypes call (native/dtmgen/dtmgen.cpp::dtmgen_tile_load):

  LAS decode + noise filter + compacted feature matrix   (io/las.py chain)
  + DTM rasterise + AGL column                            (prepare/dtm.py)
  + xy block window row-indexing                          (prepare/blocks.py)

Reference chain this fuses: load + noise
(/root/reference/prepare_data/process_data.py:96-123), DTM + AGL
(/root/reference/prepare_data/dtm.py:22-160) and blocking
(/root/reference/prepare_data/pointcloud_util.py:97-192).

Byte-equality contract (tests/test_tile_load.py): ``data`` (except the
AGL column), ``labels``, the DTM grid, and every per-window candidate
row list are byte-identical to the separate-stage Python chain; the AGL
column matches ``gen_agl(build_dtm(...))`` to f64 tolerance (identical
4-NN sets; summation-order ulps only — same tolerance class as the
existing AGL engine pairs, tests/test_dtm.py).

``DGCNN_TILE_LOAD=0`` disables the fused path (callers fall back to the
separate stages).
"""

from __future__ import annotations

import dataclasses
import os
import sys

import numpy as np

from dgcnn_tpu.prepare.blocks import MIN_BLOCK_POINTS

# build_dtm's defaults (prepare/dtm.py) — the fused call replicates them
_DTM_DEFAULTS = {
    "cell_size": 1.0,
    "desired_seed_cell_size": 90.0,
    "boundary_block_width": 5,
    "detect_water": False,
    "remove_buildings": True,
    "dtm_buffer": 6.0,
}


@dataclasses.dataclass
class TileLoad:
    """Everything predict() needs from the host load stage.

    ``win_counts``/``win_rows``: per-window candidate ROW indices into
    ``data`` (windows in i-major origin order, candidates in stable-
    x-sorted order — exactly ``_XYIndex.window``'s output), concatenated;
    windows under ``MIN_BLOCK_POINTS`` are kept in the counts (callers
    skip them exactly like room2blocks does).
    """

    data: np.ndarray        # (n_kept, width) f64, AGL column FILLED
    labels: np.ndarray      # (n_kept,) i64
    dropped: int            # noise points removed
    win_counts: np.ndarray  # (nwx*nwy,) i64
    win_rows: np.ndarray    # (sum(win_counts),) i64
    dtm_grid: np.ndarray    # (edge, edge) f32, row = x index
    geo: np.ndarray         # [dtm_min_x, dtm_min_y, dtm_width,
    #                          x_lb, x_ub, y_lb, y_ub]
    block_size: float
    agl_engine: int         # 0 lattice / 1 cellindex / 2 no-ground

    def window_candidates(self) -> list[np.ndarray]:
        """Qualifying windows' candidate row arrays, in origin order —
        the room2blocks(grid, return_indices=True) pre-sampling state."""
        offs = np.concatenate([[0], np.cumsum(self.win_counts)])
        return [
            self.win_rows[offs[w]:offs[w + 1]]
            for w in range(len(self.win_counts))
            if self.win_counts[w] >= MIN_BLOCK_POINTS
        ]


def enabled() -> bool:
    return os.environ.get("DGCNN_TILE_LOAD", "1").lower() not in (
        "0", "false", "off")


def load_tile_las(
    path: str,
    features: dict[str, int] | None = None,
    features_output: list[str] | None = None,
    *,
    filter_noise_points: bool = True,
    max_nn_dist: float = 1.0,
    dtm_kwargs: dict | None = None,
    agl_k: int = 4,
    block_size: float = 30.0,
    stride: float | None = None,
    _cap_rows: int | None = None,  # test hook: forces the retry path
) -> TileLoad | None:
    """Run the fused native tile load; None when this file/config can't be
    served natively (caller falls back to the separate-stage chain):
    non-LAS/LAZ input, non-canonical x/y/z columns (build_dtm and
    room2blocks read columns 0/1/2 positionally), no mapped AGL column,
    unsupported dtm_kwargs, or an unbuilt/stale native lib."""
    if not enabled():
        return None
    if sys.byteorder != "little":
        return None
    if path.rsplit(".", 1)[-1].lower() != "las":
        return None
    features = {k.lower(): int(v) for k, v in (
        features or {"x": 0, "y": 1, "z": 2, "agl": 3}).items()}
    features_output = [
        f.lower() for f in (features_output or list(features))]
    # the DTM/blocking stages read columns 0/1/2 positionally (build_dtm
    # takes data[:, :3]; room2blocks reads data[:, 0]/[:, 1]) — the fused
    # call is only equivalent on the canonical layout
    if (features.get("x"), features.get("y"), features.get("z")) != (0, 1, 2):
        return None
    if "agl" not in features:
        return None
    dtm = dict(_DTM_DEFAULTS)
    for k_, v in (dtm_kwargs or {}).items():
        if k_ not in _DTM_DEFAULTS:
            return None  # module_path / tin dump / use_native: not fused
        dtm[k_] = v
    stride = block_size if stride is None else stride
    if not (0 < stride <= block_size):
        return None

    try:
        from dgcnn_tpu.prepare.dtm import _native_lib
    except Exception:
        return None
    lib = _native_lib()
    if lib is None or not hasattr(lib, "dtmgen_tile_load"):
        return None
    from dgcnn_tpu.io.las import build_load_extras, read_raw_point_records

    rec = read_raw_point_records(path)
    if rec is None:
        return None
    raw, n_points, point_format, record_len, scale, offset, bbox = rec
    width = max(features[f] for f in features) + 1
    col_agl = features["agl"]
    extra_arr = build_load_extras(features, features_output, point_format)

    # capacity bounds from the header bbox (noise filtering only shrinks
    # the extent, so these upper-bound the native call's actual sizes; a
    # lying header fails the caps and we fall back to the Python chain)
    max_x, min_x, max_y, min_y = bbox[0], bbox[1], bbox[2], bbox[3]
    span = max(max_x - min_x, max_y - min_y, 0.0)
    cell = float(dtm["cell_size"])
    if cell <= 0:
        return None
    edge_bound = int((span + 2.0 * float(dtm["dtm_buffer"]) + 2.0)
                     / cell + 2.0) + 2
    nwx_bound = int(max((max_x - min_x) / stride, 0.0)) + 2
    nwy_bound = int(max((max_y - min_y) / stride, 0.0)) + 2
    cap_wins = max(nwx_bound * nwy_bound, 4)
    if edge_bound * edge_bound > 500_000_000 or cap_wins > 50_000_000:
        return None  # degenerate header extents: don't allocate for them

    import ctypes

    data = np.zeros((n_points, width), np.float64)
    labels = np.empty(n_points, np.int64)
    dtm_grid = np.empty(edge_bound * edge_bound, np.float32)
    win_counts = np.empty(cap_wins, np.int64)
    meta = np.zeros(6, np.int64)
    geo = np.zeros(7, np.float64)
    cap_rows = (n_points + n_points // 8 + 1024
                if _cap_rows is None else int(_cap_rows))

    def call(rows_cap: int) -> tuple[int, np.ndarray]:
        rows = np.empty(rows_cap, np.int64)
        rc = lib.dtmgen_tile_load(
            ctypes.cast(ctypes.c_char_p(raw),
                        ctypes.POINTER(ctypes.c_uint8)),
            n_points, record_len, point_format,
            scale[0], scale[1], scale[2], offset[0], offset[1], offset[2],
            float(max_nn_dist) if filter_noise_points else 0.0,
            width, features["x"], features["y"], features["z"],
            extra_arr.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            len(extra_arr) // 2,
            cell, float(dtm["desired_seed_cell_size"]),
            int(dtm["boundary_block_width"]),
            int(bool(dtm["detect_water"])),
            int(bool(dtm["remove_buildings"])),
            float(dtm["dtm_buffer"]), col_agl, int(agl_k),
            float(block_size), float(stride),
            data.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
            labels.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            dtm_grid.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            dtm_grid.size,
            win_counts.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            win_counts.size,
            rows.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            rows.size,
            meta.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            geo.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        )
        return rc, rows

    rc, rows = call(cap_rows)
    if rc == 0:  # everything was noise — an empty-but-valid load
        return TileLoad(
            data=data[:0], labels=labels[:0], dropped=int(n_points),
            win_counts=np.zeros(0, np.int64),
            win_rows=np.zeros(0, np.int64),
            dtm_grid=np.zeros((0, 0), np.float32), geo=geo,
            block_size=float(block_size), agl_engine=2,
        )
    if rc < 0:
        return None
    if meta[3] > cap_rows:  # heavy window-boundary duplication: re-call
        rc, rows = call(int(meta[3]))
        if rc < 0 or meta[3] > rows.size:
            return None
    n_kept = int(rc)
    if n_points - n_kept:  # log parity with loaders.load_pointcloud
        print(f"Filtered {n_points - n_kept} noise points", file=sys.stderr)
    nwx, nwy, rows_needed, edge = (
        int(meta[1]), int(meta[2]), int(meta[3]), int(meta[4]))
    return TileLoad(
        data=data[:n_kept], labels=labels[:n_kept],
        dropped=int(n_points - n_kept),
        win_counts=win_counts[:nwx * nwy].copy(),
        win_rows=rows[:rows_needed],
        dtm_grid=dtm_grid[:edge * edge].reshape(edge, edge).copy(),
        geo=geo, block_size=float(block_size), agl_engine=int(meta[5]),
    )
