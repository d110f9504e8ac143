"""DTM / AGL tests: synthetic terrain golden values, building removal,
numpy-vs-native-binary agreement, AGL on a plane
(/root/reference/prepare_data/dtm.py semantics)."""

import os
import subprocess

import numpy as np
import pytest

from dgcnn_tpu.prepare.dtm import (
    NO_DATA,
    build_dtm,
    dtm_grid,
    gen_agl,
)

def _dtmgen_cli():
    """Build (via make, seconds) and return the dtmgen CLI path; None only
    when no C++ toolchain exists. The reference-protocol subprocess path
    must be tested in a fresh checkout, not skipped."""
    from dgcnn_tpu.prepare.dtm import _native_binary

    return _native_binary()


DTMGEN = _dtmgen_cli()


def synthetic_scene(rng, n=20000, extent=60.0, with_building=True):
    """Sloped terrain + optional 10x10 m 'building' 8 m above ground +
    scattered 'vegetation' returns above ground."""
    xy = rng.random((n, 2)) * extent
    ground_z = 0.05 * xy[:, 0] + 0.02 * xy[:, 1]  # gentle slope
    z = ground_z + rng.normal(0, 0.03, n)
    # vegetation: 20% of points lifted 1-15 m
    veg = rng.random(n) < 0.2
    z[veg] += rng.random(veg.sum()) * 15 + 1
    if with_building:
        inb = (xy[:, 0] > 20) & (xy[:, 0] < 30) & (xy[:, 1] > 20) & (xy[:, 1] < 30)
        z[inb] = ground_z[inb] + 8.0  # roof returns only
    return np.column_stack([xy, z]), ground_z


def test_dtm_grid_recovers_slope(rng):
    pts, _ = synthetic_scene(rng, with_building=False)
    grid = dtm_grid(pts, 0.0, 0.0, 60.0, cell_size=1.0, seed_cell_size=30.0)
    edge = grid.shape[0]
    xs = np.arange(edge) * 1.0
    want = 0.05 * xs[:, None] + 0.02 * xs[None, :]
    valid = grid != NO_DATA
    assert valid.mean() > 0.9
    err = np.abs(grid - want)[valid]
    assert np.median(err) < 0.25, float(np.median(err))


def test_dtm_removes_building(rng):
    pts, _ = synthetic_scene(rng, with_building=True)
    grid = dtm_grid(pts, 0.0, 0.0, 60.0, cell_size=1.0, seed_cell_size=30.0)
    # inside the building footprint the DTM must stay near terrain (~1.2m),
    # far below the 8 m roof
    block = grid[21:29, 21:29]
    want = 0.05 * np.arange(21, 29)[:, None] + 0.02 * np.arange(21, 29)[None, :]
    valid = block != NO_DATA
    assert valid.any()
    assert np.median(np.abs(block - want)[valid]) < 1.5
    assert np.max(block[valid] - want[valid]) < 4.0  # nowhere near the roof


def test_dtm_keep_buildings_flag(rng):
    pts, _ = synthetic_scene(rng, with_building=True)
    grid = dtm_grid(pts, 0.0, 0.0, 60.0, cell_size=1.0,
                    seed_cell_size=30.0, remove_buildings=False)
    block = grid[22:28, 22:28]
    want = 0.05 * 25 + 0.02 * 25
    # without building removal the 'DTM' follows the roof minima
    assert np.median(block[block != NO_DATA]) > want + 4.0


def test_build_dtm_returns_ground_points(rng):
    pts, _ = synthetic_scene(rng, n=5000, extent=30.0, with_building=False)
    ground = build_dtm(pts, use_native=False, desired_seed_cell_size=15)
    assert ground.shape[1] == 3
    assert len(ground) > 100
    # ground heights track the slope field at their own xy
    want = 0.05 * ground[:, 0] + 0.02 * ground[:, 1]
    assert np.median(np.abs(ground[:, 2] - want)) < 0.4


def test_gen_agl_plane(rng):
    # DTM = flat plane z=5; points 2 m above it have AGL 2
    gx, gy = np.meshgrid(np.arange(20.0), np.arange(20.0), indexing="ij")
    dtm = np.column_stack([gx.ravel(), gy.ravel(), np.full(400, 5.0)])
    pc = np.column_stack([rng.random(50) * 19, rng.random(50) * 19,
                          np.full(50, 7.0)])
    agl = gen_agl(dtm, pc)
    np.testing.assert_allclose(agl, 2.0, atol=1e-9)


def test_gen_agl_empty_dtm():
    agl = gen_agl(np.zeros((0, 3)), np.ones((5, 3)))
    np.testing.assert_array_equal(agl, 0.0)


@pytest.mark.skipif(DTMGEN is None, reason="no C++ toolchain to build dtmgen")
def test_native_binary_matches_numpy(tmp_path, rng):
    pts, _ = synthetic_scene(rng, n=8000, extent=40.0)
    min_x = float(np.floor(pts[:, 0].min()) - 6)
    min_y = float(np.floor(pts[:, 1].min()) - 6)
    max_x = float(np.ceil(pts[:, 0].max()) + 6)
    max_y = float(np.ceil(pts[:, 1].max()) + 6)
    width = max(max_x - min_x, max_y - min_y)
    edge = int(np.floor(width / 1.0 + 0.5))

    pts_path = tmp_path / "pts.txt"
    region_path = tmp_path / "region.txt"
    outdir = tmp_path / "out"
    outdir.mkdir()
    np.savetxt(pts_path, pts)
    region_path.write_text(f"{min_x} {min_y} {min_x+width} {min_y+width}")
    subprocess.run(
        [DTMGEN, str(pts_path), str(outdir), str(region_path),
         "1", "30", "5", "false", "true", "false"],
        check=True, capture_output=True, timeout=120,
    )
    dat = outdir / f"dtm_{int(min_x)}_{int(min_y)}.dat"
    assert dat.exists()
    native = np.fromfile(dat, np.float32).reshape(edge, edge, order="F")
    ours = dtm_grid(pts, min_x, min_y, width, 1.0, 30.0, 5, False, True)
    both_valid = (native != NO_DATA) & (ours != NO_DATA)
    # identical algorithm, double-vs-float accumulation differences only
    assert both_valid.mean() > 0.5
    np.testing.assert_allclose(native[both_valid], ours[both_valid], atol=1e-3)
    # no-data masks identical
    np.testing.assert_array_equal(native == NO_DATA, ours == NO_DATA)


@pytest.mark.skipif(DTMGEN is None, reason="no C++ toolchain to build dtmgen")
def test_build_dtm_prefers_native(rng, monkeypatch):
    pts, _ = synthetic_scene(rng, n=3000, extent=20.0, with_building=False)
    a = build_dtm(pts, desired_seed_cell_size=10)   # native path
    b = build_dtm(pts, use_native=False, desired_seed_cell_size=10)
    assert a.shape == b.shape
    np.testing.assert_allclose(a[:, 2], b[:, 2], atol=1e-3)


def test_water_fill_asymmetric_hole_native_matches_numpy():
    """Jacobi vs Gauss-Seidel regression: an asymmetric multi-cell interior
    hole whose boundary heights differ per side must fill identically in the
    C++ and numpy implementations (in-place sweeping would propagate values
    right/down within one pass and diverge)."""
    from dgcnn_tpu.prepare.dtm import _dtm_grid_native

    rng = np.random.default_rng(7)
    # 20x20 m; ground plane tilted hard in x so the hole's left/right
    # boundary heights differ a lot; carve a 3x6-cell L-shaped hole
    xy = rng.random((30000, 2)) * 20
    hole = (
        (xy[:, 0] > 6) & (xy[:, 0] < 9) & (xy[:, 1] > 4) & (xy[:, 1] < 10)
    ) | ((xy[:, 0] > 9) & (xy[:, 0] < 12) & (xy[:, 1] > 4) & (xy[:, 1] < 7))
    xy = xy[~hole]
    z = 1.0 * xy[:, 0] + 0.1 * xy[:, 1]
    pts = np.column_stack([xy, z])

    kwargs = dict(min_x=0.0, min_y=0.0, width=20.0, cell_size=1.0,
                  seed_cell_size=10.0, boundary_block_width=2,
                  detect_water=True, remove_buildings=False)
    ours = dtm_grid(pts, **{k: v for k, v in kwargs.items()
                            if k not in ("seed_cell_size",)},
                    seed_cell_size=10.0)
    native = _dtm_grid_native(pts, 0.0, 0.0, 20.0, 1.0, 10.0, 2, True, False)
    if native is None:
        pytest.skip("libdtmgen.so not built and no toolchain")
    assert (ours != NO_DATA).all()  # water fill closed the hole
    np.testing.assert_array_equal(native == NO_DATA, ours == NO_DATA)
    np.testing.assert_allclose(native, ours, atol=1e-3)


def test_native_noise_mask_matches_kdtree(rng):
    """Native grid-hash noise mask must EXACTLY match the KDTree 2-NN test
    (/root/reference/prepare_data/process_data.py:115-121), including far
    outliers that inflate the bounding box past the dense-index cap."""
    from scipy.spatial import cKDTree

    from dgcnn_tpu.prepare.dtm import native_noise_mask

    xyz = np.column_stack([rng.random(20000) * 60, rng.random(20000) * 60,
                           rng.random(20000) * 10])
    xyz[:20] += 2000 + np.arange(20)[:, None] * 37  # isolated far outliers
    keep = native_noise_mask(xyz, 1.0)
    if keep is None:
        pytest.skip("native lib unavailable")
    d, _ = cKDTree(xyz).query(xyz, k=2)
    np.testing.assert_array_equal(keep, d[:, 1] < 1.0)
    assert not keep[:20].any()


def test_native_agl_knn_matches_kdtree(rng):
    """Native expanding-ring k-NN mean == cKDTree mean on grid-with-holes
    refs and on scattered refs, with in-box and far out-of-box queries
    (/root/reference/prepare_data/dtm.py:140-160 semantics)."""
    from scipy.spatial import cKDTree

    from dgcnn_tpu.prepare.dtm import native_agl_knn

    gx, gy = np.meshgrid(np.arange(40.0), np.arange(40.0), indexing="ij")
    ref = np.column_stack([gx.ravel(), gy.ravel()])
    ref = ref[rng.random(len(ref)) > 0.15]
    z = 0.05 * ref[:, 0] + rng.normal(0, 0.01, len(ref))
    q = np.vstack([
        rng.random((5000, 2)) * 39 + rng.normal(0, 1e-4, (5000, 2)),
        rng.random((200, 2)) * 39 + 500,          # far outside
    ])
    got = native_agl_knn(ref, z, q, 4)
    if got is None:
        pytest.skip("native lib unavailable")
    _, idx = cKDTree(ref).query(q, k=4)
    np.testing.assert_allclose(got, z[idx].mean(1), atol=1e-12)

    scat = rng.random((3000, 2)) * 100
    zs = rng.random(3000)
    q2 = rng.random((4000, 2)) * 120 - 10
    got2 = native_agl_knn(scat, zs, q2, 4)
    _, idx2 = cKDTree(scat).query(q2, k=4)
    np.testing.assert_allclose(got2, zs[idx2].mean(1), atol=1e-12)


def test_filter_noise_and_gen_agl_use_native(rng):
    """The public filter_noise / gen_agl fast paths agree with their scipy
    fallbacks (same functions with the native lib monkeypatched away)."""
    import dgcnn_tpu.prepare.dtm as dtm_mod
    from dgcnn_tpu.prepare.noise import filter_noise

    xyz = np.column_stack([rng.random(5000) * 30, rng.random(5000) * 30,
                           rng.random(5000) * 5])
    xyz[:5] += 300
    got = filter_noise(xyz, 1.0)
    dtm_pts = np.column_stack([rng.random(2000) * 30, rng.random(2000) * 30,
                               rng.random(2000)])
    agl = gen_agl(dtm_pts, xyz)

    import unittest.mock as mock
    with mock.patch.object(dtm_mod, "_native_lib", lambda: None):
        want_keep = filter_noise(xyz, 1.0)
        want_agl = gen_agl(dtm_pts, xyz)
    np.testing.assert_array_equal(got, want_keep)
    np.testing.assert_allclose(agl, want_agl, atol=1e-9)


def test_water_fill_ignores_exterior_margin():
    """detect_water must fill only INTERIOR holes: a cloud occupying a
    corner of the (square) region leaves a big out-of-coverage margin
    that must stay NO_DATA — filling it would fabricate terrain and
    corrupt boundary AGL (both numpy and native paths)."""
    from dgcnn_tpu.prepare.dtm import _dtm_grid_native

    rng = np.random.default_rng(3)
    # points only in [0,20]x[0,20] of a 40x40 region; one interior hole
    xy = rng.random((30000, 2)) * 20
    hole = ((xy[:, 0] > 8) & (xy[:, 0] < 11)
            & (xy[:, 1] > 8) & (xy[:, 1] < 11))
    xy = xy[~hole]
    z = 0.1 * xy[:, 0]
    pts = np.column_stack([xy, z])

    ours = dtm_grid(pts, 0.0, 0.0, 40.0, cell_size=1.0,
                    seed_cell_size=10.0, boundary_block_width=2,
                    detect_water=True, remove_buildings=False)
    # interior hole filled...
    assert (ours[9:11, 9:11] != NO_DATA).all()
    # ...but the far out-of-coverage corner stays no-data
    assert (ours[30:, 30:] == NO_DATA).all()

    native = _dtm_grid_native(pts, 0.0, 0.0, 40.0, 1.0, 10.0, 2, True,
                              False)
    if native is not None:
        np.testing.assert_array_equal(native == NO_DATA, ours == NO_DATA)
        both = (native != NO_DATA)
        np.testing.assert_allclose(native[both], ours[both], atol=1e-3)


def test_native_argsort_matches_numpy_stable():
    """dtmgen_argsort_f64 must yield the IDENTICAL permutation to
    np.argsort(kind='stable') — including duplicate keys (input order
    kept) and +-0.0 (numpy compares them equal; the radix key transform
    maps -0.0 onto +0.0). It feeds _XYIndex, whose window results feed
    the rng-sensitive block sampling — any permutation drift would
    silently change every predict() output."""
    from dgcnn_tpu.prepare.dtm import native_argsort_f64

    rng = np.random.default_rng(0)
    cases = [
        rng.random(100_000) * 120.0,
        rng.integers(0, 50, 50_000).astype(np.float64),  # heavy ties
        np.array([0.0, -0.0, 1.0, -0.0, 0.0, -1.0, -0.0]),
        np.arange(1000, 0, -1, dtype=np.float64),
        np.array([], np.float64),
        np.array([3.14]),
        np.concatenate([rng.random(1000), -rng.random(1000),
                        np.zeros(100)]),
    ]
    got0 = native_argsort_f64(cases[0])
    if got0 is None:
        pytest.skip("native library unavailable")
    for i, k in enumerate(cases):
        got = native_argsort_f64(k)
        want = np.argsort(k, kind="stable")
        np.testing.assert_array_equal(got, want, err_msg=f"case {i}")
