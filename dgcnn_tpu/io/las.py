"""Native LAS reader/writer (ASPRS LAS 1.1-1.4, uncompressed).

Replaces the reference's laspy dependency
(/root/reference/prepare_data/process_data.py:48-158). The full point
record block is decoded in one ``np.frombuffer`` with a structured dtype —
no per-point Python. Supports reading point formats 0-3 (classic) and 6-8
(LAS 1.4), and writing LAS 1.2 / point-format 3 (+0-2), the format the
reference emits (process_data.py:135, predictions.py:14).
"""

from __future__ import annotations

import dataclasses
import struct
from typing import BinaryIO

import numpy as np

_SIGNATURE = b"LASF"

# point-record structured dtypes by format id
_COMMON0 = [
    ("X", "<i4"), ("Y", "<i4"), ("Z", "<i4"),
    ("intensity", "<u2"), ("flags", "u1"), ("raw_classification", "u1"),
    ("scan_angle", "i1"), ("user_data", "u1"), ("point_source_id", "<u2"),
]
_COMMON6 = [
    ("X", "<i4"), ("Y", "<i4"), ("Z", "<i4"),
    ("intensity", "<u2"), ("returns", "u1"), ("flags", "u1"),
    ("raw_classification", "u1"), ("user_data", "u1"),
    ("scan_angle", "<i2"), ("point_source_id", "<u2"), ("gps_time", "<f8"),
]
_RGB = [("red", "<u2"), ("green", "<u2"), ("blue", "<u2")]
_POINT_DTYPES = {
    0: np.dtype(_COMMON0),
    1: np.dtype(_COMMON0 + [("gps_time", "<f8")]),
    2: np.dtype(_COMMON0 + _RGB),
    3: np.dtype(_COMMON0 + [("gps_time", "<f8")] + _RGB),
    6: np.dtype(_COMMON6),
    7: np.dtype(_COMMON6 + _RGB),
    8: np.dtype(_COMMON6 + _RGB + [("nir", "<u2")]),
}

_HEADER12 = struct.Struct(
    "<4sHH" + "16s" + "BB32s32sHHHIIBHI" + "5I" + "12d"
)
# fields: sig, file_source, global_enc, guid, ver_major, ver_minor, sysid,
# software, day, year, header_size, point_offset, n_vlrs, point_format,
# record_len, n_points, n_by_return[5], scales[3]+offsets[3]+minmax[6]


@dataclasses.dataclass
class LasData:
    """Decoded LAS point cloud (real-world float64 coordinates)."""

    x: np.ndarray
    y: np.ndarray
    z: np.ndarray
    classification: np.ndarray          # u8 (5-bit field for formats 0-5)
    intensity: np.ndarray | None = None
    return_number: np.ndarray | None = None
    number_of_returns: np.ndarray | None = None
    red: np.ndarray | None = None
    green: np.ndarray | None = None
    blue: np.ndarray | None = None
    gps_time: np.ndarray | None = None
    point_source_id: np.ndarray | None = None
    point_format: int = 3
    version: tuple[int, int] = (1, 2)

    def __len__(self) -> int:
        return len(self.x)

    @property
    def xyz(self) -> np.ndarray:
        return np.stack([self.x, self.y, self.z], axis=1)

    def field(self, name: str) -> np.ndarray | None:
        return getattr(self, name, None)


def read_las(path: str) -> LasData:
    """Read an uncompressed .las file (formats 0-3, 6-8; versions 1.1-1.4)."""
    with open(path, "rb") as f:
        return _read_las_stream(f)


def _native_decode(
    raw: bytes, n_points: int, record_len: int, point_format: int,
    scale: np.ndarray, offset: np.ndarray, ver: tuple[int, int],
) -> LasData | None:
    """One-pass parallel record decode via libdtmgen.so
    (native/dtmgen/dtmgen.cpp::dtmgen_las_decode); None → numpy fallback.
    Byte-equal to the structured-dtype path (tests/test_las_io.py)."""
    import ctypes
    import sys

    if sys.byteorder != "little" or n_points == 0:
        return None  # LAS fields are little-endian; native assumes host LE
    try:
        from dgcnn_tpu.prepare.dtm import _native_lib
    except Exception:
        return None
    lib = _native_lib()
    if lib is None or not hasattr(lib, "dtmgen_las_decode"):
        return None
    n = n_points
    x = np.empty(n, np.float64)
    y = np.empty(n, np.float64)
    z = np.empty(n, np.float64)
    cls = np.empty(n, np.uint8)
    intensity = np.empty(n, np.uint16)
    ret_num = np.empty(n, np.uint8)
    num_ret = np.empty(n, np.uint8)
    psid = np.empty(n, np.uint16)
    has_gps = point_format in (1, 3, 6, 7, 8)
    has_rgb = point_format in (2, 3, 7, 8)
    gps = np.empty(n, np.float64) if has_gps else None
    rgb = np.empty((n, 3), np.uint16) if has_rgb else None

    def ptr(a, ct):
        return a.ctypes.data_as(ctypes.POINTER(ct))

    rc = lib.dtmgen_las_decode(
        ctypes.cast(ctypes.c_char_p(raw), ctypes.POINTER(ctypes.c_uint8)),
        n, record_len, point_format,
        scale[0], scale[1], scale[2], offset[0], offset[1], offset[2],
        ptr(x, ctypes.c_double), ptr(y, ctypes.c_double),
        ptr(z, ctypes.c_double), ptr(cls, ctypes.c_uint8),
        ptr(intensity, ctypes.c_uint16), ptr(ret_num, ctypes.c_uint8),
        ptr(num_ret, ctypes.c_uint8), ptr(psid, ctypes.c_uint16),
        gps.ctypes.data if gps is not None else None,
        rgb.ctypes.data if rgb is not None else None,
    )
    if rc:
        return None
    return LasData(
        x=x, y=y, z=z, classification=cls,
        intensity=intensity, return_number=ret_num,
        number_of_returns=num_ret,
        red=rgb[:, 0] if rgb is not None else None,
        green=rgb[:, 1] if rgb is not None else None,
        blue=rgb[:, 2] if rgb is not None else None,
        gps_time=gps, point_source_id=psid,
        point_format=point_format, version=ver,
    )


# field ids of native/dtmgen/dtmgen.cpp::dtmgen_las_load's `extra` pairs
_LOAD_FIELD_IDS = {
    "intensity": 0, "return_number": 1, "number_of_returns": 2,
    "red": 3, "green": 4, "blue": 5,
}
_RGB_FORMATS = (2, 3, 7, 8)


def build_load_extras(
    features: dict[str, int], features_output: list[str], point_format: int
) -> np.ndarray:
    """(field_id, out_column) int32 pairs for the native LAS loaders'
    ``extra`` argument (dtmgen_las_load / dtmgen_tile_load). 'agl' and
    unknown names are skipped (they stay zero-filled, matching
    loaders.py); rgb fields are skipped for rgb-less formats."""
    extras: list[int] = []
    for name in features_output:
        if name in ("x", "y", "z") or name not in features:
            continue
        fid = _LOAD_FIELD_IDS.get(name)
        if fid is None:  # 'agl' stays zero-filled; unknown names skipped
            continue
        if fid >= 3 and point_format not in _RGB_FORMATS:
            continue  # rgb requested from an rgb-less format → zeros
        extras += [fid, features[name]]
    return np.asarray(extras, np.int32)


def read_raw_point_records(
    path: str,
) -> "tuple[bytes, int, int, int, tuple, tuple, tuple] | None":
    """Read an uncompressed LAS file's raw point-record block + the header
    fields the native decoders need: ``(raw, n_points, point_format,
    record_len, (sx, sy, sz), (ox, oy, oz), (max_x, min_x, max_y, min_y,
    max_z, min_z))``. None when the file is LAZ/truncated/an unsupported
    format (callers fall back to the numpy chain)."""
    try:
        with open(path, "rb") as f:
            head = f.read(375)
            if head[:4] != _SIGNATURE or head[104] & 0x80:
                return None
            point_offset = struct.unpack_from("<I", head, 96)[0]
            point_format = head[104] & 0x3F
            record_len = struct.unpack_from("<H", head, 105)[0]
            n_points = struct.unpack_from("<I", head, 107)[0]
            scale = struct.unpack_from("<3d", head, 131)
            offset = struct.unpack_from("<3d", head, 155)
            bbox = struct.unpack_from("<6d", head, 179)
            if (head[24], head[25]) >= (1, 4):
                n64 = struct.unpack_from("<Q", head, 247)[0]
                if n64:
                    n_points = n64
            if (point_format not in _POINT_DTYPES
                    or record_len < _POINT_DTYPES[point_format].itemsize
                    or n_points == 0):
                return None
            f.seek(point_offset)
            raw = f.read(record_len * n_points)
    except OSError:
        return None
    if len(raw) < record_len * n_points:
        return None
    return raw, n_points, point_format, record_len, scale, offset, bbox


def load_las_matrix(
    path: str,
    features: dict[str, int],
    features_output: list[str],
    filter_noise_points: bool = True,
    max_nn_dist: float = 1.0,
) -> tuple[np.ndarray, np.ndarray, int] | None:
    """Fused native load: LAS decode + isolated-point noise filter +
    compacted feature-matrix assembly in ONE libdtmgen call
    (native/dtmgen/dtmgen.cpp::dtmgen_las_load) — two parallel passes over
    the record buffer, no intermediate per-field arrays, no Python-side
    boolean compaction. Byte-equal to the loaders.py fallback chain
    (tests/test_las_io.py). ``features``/``features_output`` must be
    lower-cased (loaders.load_pointcloud normalises them).

    Returns ``(data (n_kept, width) float64, labels (n_kept,) int64,
    n_dropped)``, or None when the native path can't serve this file
    (lib unbuilt, big-endian host, unsupported/truncated file — the
    caller's numpy chain then produces the canonical result or error).
    """
    import ctypes
    import sys

    if sys.byteorder != "little":
        return None
    try:
        from dgcnn_tpu.prepare.dtm import _native_lib
    except Exception:
        return None
    lib = _native_lib()
    if lib is None or not hasattr(lib, "dtmgen_las_load"):
        return None
    rec = read_raw_point_records(path)
    if rec is None:
        return None
    raw, n_points, point_format, record_len, scale, offset, _bbox = rec

    width = max(features[f] for f in features) + 1
    extra_arr = build_load_extras(features, features_output, point_format)

    data = np.zeros((n_points, width), np.float64)
    labels = np.empty(n_points, np.int64)
    n_kept = lib.dtmgen_las_load(
        ctypes.cast(ctypes.c_char_p(raw), ctypes.POINTER(ctypes.c_uint8)),
        n_points, record_len, point_format,
        scale[0], scale[1], scale[2], offset[0], offset[1], offset[2],
        float(max_nn_dist) if filter_noise_points else 0.0,
        width, features["x"], features["y"], features["z"],
        extra_arr.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        len(extra_arr) // 2,
        data.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        labels.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
    )
    if n_kept < 0:
        return None
    return data[:n_kept], labels[:n_kept], n_points - n_kept


def _read_las_stream(f: BinaryIO) -> LasData:
    head = f.read(375)
    if head[:4] != _SIGNATURE:
        raise ValueError("not a LAS file (bad signature)")
    ver = (head[24], head[25])
    point_offset = struct.unpack_from("<I", head, 96)[0]
    point_format = head[104] & 0x3F
    if head[104] & 0x80:
        raise ValueError("LAZ (compressed) input is not supported")
    record_len = struct.unpack_from("<H", head, 105)[0]
    n_points = struct.unpack_from("<I", head, 107)[0]
    scale = np.array(struct.unpack_from("<3d", head, 131))
    offset = np.array(struct.unpack_from("<3d", head, 155))
    if ver >= (1, 4):
        n64 = struct.unpack_from("<Q", head, 247)[0]
        if n64:
            n_points = n64
    if point_format not in _POINT_DTYPES:
        raise ValueError(f"unsupported LAS point format {point_format}")
    base = _POINT_DTYPES[point_format]
    if record_len < base.itemsize:
        raise ValueError(
            f"record length {record_len} < expected {base.itemsize}"
        )
    # extra per-point bytes (extra dims) are preserved as opaque padding
    dtype = (
        base
        if record_len == base.itemsize
        else np.dtype(base.descr + [("extra", "V", record_len - base.itemsize)])
    )
    f.seek(point_offset)
    raw = f.read(record_len * n_points)
    if len(raw) >= record_len * n_points:
        native = _native_decode(
            raw, n_points, record_len, point_format, scale, offset, ver
        )
        if native is not None:
            return native
    pts = np.frombuffer(raw, dtype=dtype, count=n_points)

    x = pts["X"] * scale[0] + offset[0]
    y = pts["Y"] * scale[1] + offset[1]
    z = pts["Z"] * scale[2] + offset[2]
    if point_format >= 6:
        classification = pts["raw_classification"].copy()
        ret_num = pts["returns"] & 0x0F
        num_ret = (pts["returns"] >> 4) & 0x0F
    else:
        classification = pts["raw_classification"] & 0x1F
        ret_num = pts["flags"] & 0x07
        num_ret = (pts["flags"] >> 3) & 0x07

    def opt(name):
        return pts[name].copy() if name in dtype.names else None

    return LasData(
        x=x, y=y, z=z,
        classification=classification.astype(np.uint8),
        intensity=pts["intensity"].copy(),
        return_number=ret_num.astype(np.uint8),
        number_of_returns=num_ret.astype(np.uint8),
        red=opt("red"), green=opt("green"), blue=opt("blue"),
        gps_time=opt("gps_time"),
        point_source_id=pts["point_source_id"].copy(),
        point_format=point_format,
        version=ver,
    )


def write_las(
    path: str,
    x: np.ndarray,
    y: np.ndarray,
    z: np.ndarray,
    classification: np.ndarray,
    *,
    point_format: int = 3,
    intensity: np.ndarray | None = None,
    return_number: np.ndarray | None = None,
    number_of_returns: np.ndarray | None = None,
    red: np.ndarray | None = None,
    green: np.ndarray | None = None,
    blue: np.ndarray | None = None,
    gps_time: np.ndarray | None = None,
    point_source_id: np.ndarray | None = None,
    scale: tuple[float, float, float] = (0.001, 0.001, 0.001),
) -> None:
    """Write LAS 1.2 with point format 0-3 (default 3, like the reference's
    ``laspy.create(file_version="1.2", point_format=3)``,
    /root/reference/prepare_data/process_data.py:135)."""
    if point_format not in (0, 1, 2, 3):
        raise ValueError("writer supports point formats 0-3")
    x = np.asarray(x, np.float64)
    y = np.asarray(y, np.float64)
    z = np.asarray(z, np.float64)
    n = len(x)
    if not (len(y) == len(z) == n):
        raise ValueError("x/y/z length mismatch")
    classification = np.asarray(classification).astype(np.uint8).reshape(-1)
    if len(classification) != n:
        raise ValueError("classification length mismatch")

    offset = np.array([x.min(), y.min(), z.min()]) if n else np.zeros(3)
    scale_arr = np.asarray(scale, np.float64)
    dtype = _POINT_DTYPES[point_format]
    pts = np.zeros(n, dtype=dtype)
    pts["X"] = np.round((x - offset[0]) / scale_arr[0]).astype(np.int64)
    pts["Y"] = np.round((y - offset[1]) / scale_arr[1]).astype(np.int64)
    pts["Z"] = np.round((z - offset[2]) / scale_arr[2]).astype(np.int64)
    pts["raw_classification"] = classification & 0x1F
    if intensity is not None:
        pts["intensity"] = np.asarray(intensity).astype(np.uint16)
    rn = (np.asarray(return_number).astype(np.uint8) & 0x07
          if return_number is not None else np.ones(n, np.uint8))
    nr = (np.asarray(number_of_returns).astype(np.uint8) & 0x07
          if number_of_returns is not None else np.ones(n, np.uint8))
    pts["flags"] = rn | (nr << 3)
    if point_source_id is not None:
        pts["point_source_id"] = np.asarray(point_source_id).astype(np.uint16)
    if gps_time is not None and "gps_time" in dtype.names:
        pts["gps_time"] = np.asarray(gps_time, np.float64)
    for name, arr in (("red", red), ("green", green), ("blue", blue)):
        if arr is not None and name in dtype.names:
            pts[name] = np.asarray(arr).astype(np.uint16)

    n_by_return = np.zeros(5, np.uint32)
    counts = np.bincount(np.clip(rn, 1, 5) - 1, minlength=5)[:5] if n else n_by_return
    header = _HEADER12.pack(
        _SIGNATURE, 0, 0, b"\0" * 16, 1, 2,
        b"dgcnn_tpu".ljust(32, b"\0"), b"dgcnn_tpu las writer".ljust(32, b"\0"),
        1, 2026, _HEADER12.size, _HEADER12.size, 0,
        point_format, dtype.itemsize, n,
        *counts.astype(np.uint32).tolist(),
        scale_arr[0], scale_arr[1], scale_arr[2],
        offset[0], offset[1], offset[2],
        (x.max() if n else 0.0), (x.min() if n else 0.0),
        (y.max() if n else 0.0), (y.min() if n else 0.0),
        (z.max() if n else 0.0), (z.min() if n else 0.0),
    )
    assert _HEADER12.size == 227, _HEADER12.size
    with open(path, "wb") as f:
        f.write(header)
        f.write(pts.tobytes())


def save_las_pointcloud(
    data: np.ndarray,
    labels: np.ndarray,
    filename: str,
    features_output: list[str] | None = None,
    features: dict[str, int] | None = None,
) -> None:
    """Reference-API writer (/root/reference/prepare_data/
    process_data.py:125-158): data columns 0-2 are x/y/z; optional feature
    columns selected by the ``features`` name→column map."""
    features_output = features_output or []
    features = features or {}
    extras = {}
    for name in ("red", "green", "blue", "intensity", "return_number",
                 "number_of_returns"):
        if name in features_output and name in features:
            extras[name] = data[:, features[name]]
    write_las(
        filename, data[:, 0], data[:, 1], data[:, 2],
        np.asarray(labels).reshape(-1), **extras,
    )
