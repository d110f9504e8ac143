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
