"""LAS I/O tests: write/read round-trips, header fields, format variants,
HDF5 reader contract (/root/reference/prepare_data/process_data.py:17-158)."""

import numpy as np
import pytest

from dgcnn_tpu.io.h5 import read_h5_pointcloud
from dgcnn_tpu.io.las import LasData, read_las, write_las


@pytest.fixture
def cloud(rng):
    n = 500
    return {
        "x": rng.random(n) * 1000 + 5e5,
        "y": rng.random(n) * 1000 + 6e6,
        "z": rng.random(n) * 80,
        "classification": rng.integers(0, 31, n).astype(np.uint8),
        "intensity": rng.integers(0, 65535, n).astype(np.uint16),
        "return_number": rng.integers(1, 5, n).astype(np.uint8),
        "number_of_returns": rng.integers(1, 5, n).astype(np.uint8),
    }


def test_round_trip_fmt3(tmp_path, cloud):
    path = str(tmp_path / "a.las")
    write_las(path, **cloud)
    back = read_las(path)
    assert back.point_format == 3 and back.version == (1, 2)
    np.testing.assert_allclose(back.x, cloud["x"], atol=1e-3)
    np.testing.assert_allclose(back.y, cloud["y"], atol=1e-3)
    np.testing.assert_allclose(back.z, cloud["z"], atol=1e-3)
    np.testing.assert_array_equal(back.classification, cloud["classification"] & 0x1F)
    np.testing.assert_array_equal(back.intensity, cloud["intensity"])
    np.testing.assert_array_equal(back.return_number, cloud["return_number"])
    np.testing.assert_array_equal(
        back.number_of_returns, cloud["number_of_returns"]
    )


def test_round_trip_rgb(tmp_path, cloud, rng):
    path = str(tmp_path / "rgb.las")
    rgb = {c: rng.integers(0, 65535, len(cloud["x"])).astype(np.uint16)
           for c in ("red", "green", "blue")}
    write_las(path, cloud["x"], cloud["y"], cloud["z"],
              cloud["classification"], point_format=2, **rgb)
    back = read_las(path)
    assert back.point_format == 2
    for c in rgb:
        np.testing.assert_array_equal(getattr(back, c), rgb[c])
    assert back.gps_time is None


def test_round_trip_fmt0_and_1(tmp_path, cloud, rng):
    for fmt in (0, 1):
        path = str(tmp_path / f"f{fmt}.las")
        gps = rng.random(len(cloud["x"])) * 1e5 if fmt == 1 else None
        write_las(path, cloud["x"], cloud["y"], cloud["z"],
                  cloud["classification"], point_format=fmt, gps_time=gps)
        back = read_las(path)
        assert back.point_format == fmt
        if fmt == 1:
            np.testing.assert_allclose(back.gps_time, gps)


def test_empty_cloud(tmp_path):
    path = str(tmp_path / "empty.las")
    write_las(path, np.zeros(0), np.zeros(0), np.zeros(0), np.zeros(0))
    back = read_las(path)
    assert len(back) == 0


def test_bad_signature(tmp_path):
    path = tmp_path / "bad.las"
    path.write_bytes(b"NOPE" + b"\0" * 300)
    with pytest.raises(ValueError, match="signature"):
        read_las(str(path))


def test_length_mismatch_raises(tmp_path):
    with pytest.raises(ValueError, match="mismatch"):
        write_las(str(tmp_path / "x.las"), np.zeros(3), np.zeros(2),
                  np.zeros(3), np.zeros(3))


def test_xyz_property(cloud, tmp_path):
    path = str(tmp_path / "p.las")
    write_las(path, **cloud)
    back = read_las(path)
    assert back.xyz.shape == (len(cloud["x"]), 3)


def test_h5_reader(tmp_path, rng):
    import h5py

    n = 100
    pos = rng.random((n, 3)) * 100
    cls = rng.integers(0, 6, n)
    agl = rng.random(n) * 10
    path = str(tmp_path / "pc.h5")
    with h5py.File(path, "w") as f:
        f.create_dataset("LAS/Position", data=pos)
        f.create_dataset("LAS/Classification", data=cls)
        f.create_dataset("AGL", data=agl)
        f.create_dataset("LAS/Intensity", data=rng.integers(0, 100, n))
    out = read_h5_pointcloud(path)
    np.testing.assert_allclose(out["position"], pos)
    np.testing.assert_array_equal(out["classification"], cls)
    np.testing.assert_allclose(out["agl"], agl)
    assert "intensity" in out and "color" not in out


# ---------------------------------------------------------- native decoder
# One-pass parallel record decode (native/dtmgen/dtmgen.cpp::
# dtmgen_las_decode) must be byte-equal to the structured-dtype numpy twin
# for every supported format. Builds the .so on first use (like test_dtm).
def _native_ready():
    from dgcnn_tpu.prepare.dtm import _native_lib

    lib = _native_lib()
    return lib is not None and hasattr(lib, "dtmgen_las_decode")


NATIVE_LAS = _native_ready()

_FIELDS = ("x", "y", "z", "classification", "intensity", "return_number",
           "number_of_returns", "red", "green", "blue", "gps_time",
           "point_source_id")


def _numpy_decode(path, monkeypatch):
    """read_las with the native fast path disabled."""
    import dgcnn_tpu.io.las as las_mod

    monkeypatch.setattr(las_mod, "_native_decode", lambda *a, **k: None)
    try:
        return read_las(path)
    finally:
        monkeypatch.undo()


def _assert_las_equal(a: LasData, b: LasData):
    for f in _FIELDS:
        va, vb = getattr(a, f), getattr(b, f)
        assert (va is None) == (vb is None), f
        if va is not None:
            np.testing.assert_array_equal(np.asarray(va), np.asarray(vb), f)


@pytest.mark.skipif(not NATIVE_LAS, reason="no C++ toolchain for libdtmgen")
@pytest.mark.parametrize("fmt", [0, 1, 2, 3])
def test_native_decode_matches_numpy_classic(tmp_path, cloud, rng, fmt,
                                             monkeypatch):
    n = len(cloud["x"])
    kw = dict(intensity=cloud["intensity"],
              return_number=cloud["return_number"],
              number_of_returns=cloud["number_of_returns"],
              point_source_id=rng.integers(0, 65535, n).astype(np.uint16))
    if fmt in (1, 3):
        kw["gps_time"] = rng.random(n) * 1e6
    if fmt in (2, 3):
        for c in ("red", "green", "blue"):
            kw[c] = rng.integers(0, 65535, n).astype(np.uint16)
    path = str(tmp_path / f"c{fmt}.las")
    write_las(path, cloud["x"], cloud["y"], cloud["z"],
              cloud["classification"], point_format=fmt, **kw)
    _assert_las_equal(read_las(path), _numpy_decode(path, monkeypatch))


def _write_las14(path, fmt, pts, scale, offset):
    """Minimal LAS 1.4 file around a structured point-record array
    (header layout per the ASPRS spec; only the fields read_las consumes
    are populated — legacy count 0 forces the 64-bit count at offset
    247, io/las.py:101-104)."""
    import struct

    head = bytearray(375)
    head[0:4] = b"LASF"
    head[24], head[25] = 1, 4
    struct.pack_into("<H", head, 94, 375)              # header size
    struct.pack_into("<I", head, 96, 375)              # point data offset
    head[104] = fmt
    struct.pack_into("<H", head, 105, pts.dtype.itemsize)
    struct.pack_into("<3d", head, 131, *scale)
    struct.pack_into("<3d", head, 155, *offset)
    struct.pack_into("<Q", head, 247, len(pts))
    with open(path, "wb") as f:
        f.write(head)
        f.write(pts.tobytes())


@pytest.mark.skipif(not NATIVE_LAS, reason="no C++ toolchain for libdtmgen")
@pytest.mark.parametrize("fmt,extra", [(6, 0), (7, 0), (8, 0), (6, 5)])
def test_native_decode_matches_numpy_modern(tmp_path, rng, fmt, extra,
                                            monkeypatch):
    """Formats 6-8 (LAS 1.4 extended records) + extra per-point padding
    bytes, which the numpy twin keeps as an opaque field and the native
    decoder strides over."""
    from dgcnn_tpu.io.las import _POINT_DTYPES

    base = _POINT_DTYPES[fmt]
    dtype = (base if not extra
             else np.dtype(base.descr + [("extra", "V", extra)]))
    n = 300
    pts = np.zeros(n, dtype)
    for name in base.names:
        info = base.fields[name][0]
        if info.kind in "iu":
            lo, hi = np.iinfo(info).min, np.iinfo(info).max
            pts[name] = rng.integers(lo, int(hi) + 1, n).astype(info)
        elif info.kind == "f":
            pts[name] = rng.random(n) * 1e6
    path = str(tmp_path / f"m{fmt}_{extra}.las")
    _write_las14(path, fmt, pts, (0.001, 0.001, 0.001), (5e5, 6e6, 0.0))
    a = read_las(path)
    b = _numpy_decode(path, monkeypatch)
    assert a.point_format == fmt and a.version == (1, 4)
    _assert_las_equal(a, b)


# ------------------------------------------------------------- fused load
# dtmgen_las_load: decode + noise filter + compacted feature-matrix
# assembly in one native call — must equal the loaders.py fallback chain
# (decode → column stack → filter_noise → boolean compaction) EXACTLY
# (same f64 arithmetic, same grid-hash noise kernel).


def _load_fallback(path, features, features_output, filter_noise,
                   monkeypatch):
    """load_pointcloud with the fused native path disabled."""
    import dgcnn_tpu.io.las as las_mod
    from dgcnn_tpu.prepare.loaders import load_pointcloud

    monkeypatch.setattr(las_mod, "load_las_matrix", lambda *a, **k: None)
    try:
        return load_pointcloud(path, features_output=features_output,
                               features=features,
                               filter_noise_points=filter_noise)
    finally:
        monkeypatch.undo()


@pytest.mark.skipif(not NATIVE_LAS, reason="no C++ toolchain for libdtmgen")
@pytest.mark.parametrize("fmt,filter_noise", [(0, True), (3, True),
                                              (3, False), (2, True)])
def test_fused_load_matches_fallback_classic(tmp_path, rng, fmt,
                                             filter_noise, monkeypatch):
    """Dense cluster + isolated far points: the fused path must drop the
    same rows and produce a bit-identical matrix. Format 0 additionally
    exercises rgb-requested-from-rgbless-format (column stays zero)."""
    from dgcnn_tpu.io.las import load_las_matrix
    from dgcnn_tpu.prepare.loaders import load_pointcloud

    n = 900
    x = np.concatenate([rng.random(n - 3) * 5 + 5e5,
                        5e5 + np.array([500.0, 900.0, 1400.0])])
    y = np.concatenate([rng.random(n - 3) * 5 + 6e6,
                        6e6 + np.array([500.0, 900.0, 1400.0])])
    z = np.concatenate([rng.random(n - 3) * 2, np.array([3.0, 4.0, 5.0])])
    kw = dict(intensity=rng.integers(0, 65535, n).astype(np.uint16),
              return_number=rng.integers(1, 5, n).astype(np.uint8),
              number_of_returns=rng.integers(1, 5, n).astype(np.uint8))
    if fmt in (2, 3):
        for c in ("red", "green", "blue"):
            kw[c] = rng.integers(0, 65535, n).astype(np.uint16)
    path = str(tmp_path / f"f{fmt}.las")
    write_las(path, x, y, z, rng.integers(0, 31, n), point_format=fmt,
              **kw)

    features = {"x": 0, "y": 1, "z": 2, "agl": 3, "intensity": 4,
                "red": 5, "return_number": 6}
    out_cols = ["x", "y", "z", "agl", "intensity", "red", "return_number"]
    fused = load_las_matrix(path, features, out_cols,
                            filter_noise_points=filter_noise)
    assert fused is not None  # NATIVE_LAS guaranteed the lib
    data_f, labels_f, dropped = fused
    data_b, labels_b = _load_fallback(path, features, out_cols,
                                      filter_noise, monkeypatch)
    assert dropped == (3 if filter_noise else 0)
    np.testing.assert_array_equal(data_f, data_b)
    np.testing.assert_array_equal(labels_f, labels_b)
    assert labels_f.dtype == labels_b.dtype == np.int64
    np.testing.assert_array_equal(data_f[:, 3], 0.0)  # agl zero-filled
    if fmt == 0:  # rgb-less format: requested red column stays zero
        np.testing.assert_array_equal(data_f[:, 5], 0.0)

    # the public entry must route through the fused path and match too
    data_p, labels_p = load_pointcloud(
        path, features_output=out_cols, features=features,
        filter_noise_points=filter_noise)
    np.testing.assert_array_equal(data_p, data_b)
    np.testing.assert_array_equal(labels_p, labels_b)


@pytest.mark.skipif(not NATIVE_LAS, reason="no C++ toolchain for libdtmgen")
@pytest.mark.parametrize("fmt,extra", [(6, 0), (8, 5)])
def test_fused_load_matches_fallback_modern(tmp_path, rng, fmt, extra,
                                            monkeypatch):
    """LAS 1.4 extended records (+ extra per-point bytes): fused load
    equals the fallback, including the 4-bit return fields and the
    unmasked 8-bit classification."""
    from dgcnn_tpu.io.las import _POINT_DTYPES, load_las_matrix

    base = _POINT_DTYPES[fmt]
    dtype = (base if not extra
             else np.dtype(base.descr + [("extra", "V", extra)]))
    n = 400
    pts = np.zeros(n, dtype)
    for name in base.names:
        info = base.fields[name][0]
        if info.kind in "iu":
            lo, hi = np.iinfo(info).min, np.iinfo(info).max
            pts[name] = rng.integers(lo, int(hi) + 1, n).astype(info)
        elif info.kind == "f":
            pts[name] = rng.random(n) * 1e6
    # coordinates tight enough that scaled values form a plausible cloud
    for f_, o in (("X", 0), ("Y", 1), ("Z", 2)):
        pts[f_] = rng.integers(0, 20000, n).astype(np.int32)
    path = str(tmp_path / f"m{fmt}.las")
    _write_las14(path, fmt, pts, (0.001, 0.001, 0.001), (5e5, 6e6, 0.0))

    features = {"x": 0, "y": 1, "z": 2, "intensity": 3,
                "number_of_returns": 4}
    out_cols = list(features)
    fused = load_las_matrix(path, features, out_cols,
                            filter_noise_points=True)
    assert fused is not None
    data_f, labels_f, dropped = fused
    data_b, labels_b = _load_fallback(path, features, out_cols, True,
                                      monkeypatch)
    assert len(data_f) + dropped == n
    np.testing.assert_array_equal(data_f, data_b)
    np.testing.assert_array_equal(labels_f, labels_b)


@pytest.mark.skipif(not NATIVE_LAS, reason="no C++ toolchain for libdtmgen")
def test_fused_load_native_error_paths(rng):
    """dtmgen_las_load returns -1 (never writes) on bad inputs: unknown
    format id, rgb extra requested from an rgb-less format, out-of-range
    columns."""
    import ctypes

    from dgcnn_tpu.prepare.dtm import _native_lib

    lib = _native_lib()
    n, rl = 4, 20
    buf = bytes(n * rl)
    bufp = ctypes.cast(ctypes.c_char_p(buf),
                       ctypes.POINTER(ctypes.c_uint8))
    data = np.zeros((n, 4))
    labels = np.zeros(n, np.int64)
    dp = data.ctypes.data_as(ctypes.POINTER(ctypes.c_double))
    lp = labels.ctypes.data_as(ctypes.POINTER(ctypes.c_int64))
    no_extra = np.zeros(0, np.int32)
    ep = no_extra.ctypes.data_as(ctypes.POINTER(ctypes.c_int32))

    def call(fmt=0, extra=None, cols=(0, 1, 2), width=4):
        e = (np.asarray(extra, np.int32) if extra is not None
             else no_extra)
        return lib.dtmgen_las_load(
            bufp, n, rl, fmt, 1.0, 1.0, 1.0, 0.0, 0.0, 0.0, 0.0,
            width, cols[0], cols[1], cols[2],
            e.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            len(e) // 2, dp, lp)

    assert call(fmt=5) == -1                       # unsupported format
    assert call(extra=[3, 3]) == -1                # rgb from rgb-less fmt 0
    assert call(extra=[0, 9]) == -1                # extra col out of range
    assert call(cols=(0, 1, 7)) == -1              # xyz col out of range
    assert call() == n                             # sanity: valid call
