"""Dataset-assembly edge cases: clouds with no qualifying blocks, unmapped
classes, empty remap results."""

import numpy as np

from dgcnn_tpu.io.las import write_las
from dgcnn_tpu.prepare.pipeline import load_pointcloud_dir


def test_no_qualifying_subblocks(tmp_path, rng):
    """A cloud whose sub-blocks never satisfy the per-class minimum must
    produce an empty (not crashing) result."""
    import json

    pc = tmp_path / "pc"
    out = tmp_path / "out"
    las_dir = tmp_path / "las"
    pc.mkdir()
    n = 3000
    # single class only -> per-class min test fails for the others
    write_las(str(pc / "t.las"),
              rng.random(n) * 50, rng.random(n) * 50, rng.random(n),
              np.full(n, 2))
    cmap = tmp_path / "cm.json"
    cmap.write_text(json.dumps({"2": 1, "5": 2, "6": 0}))
    data, labels = load_pointcloud_dir(
        str(pc), str(out), block_size=40, sample_num=2,
        class_map_file=str(cmap), min_num=100, las_dir=str(las_dir),
        features_output=["x", "y", "z"],
        features={"x": 0, "y": 1, "z": 2},
        calc_agl=False, num_points=256, sub_block_size=20,
        sub_sample_num=2, n_tries=2, seed=0,
    )
    assert len(data) == 0


def test_all_unmapped_classes_skipped(tmp_path, rng):
    """Blocks whose every point has an unmapped class are skipped."""
    import json

    pc = tmp_path / "pc"
    out = tmp_path / "out"
    las_dir = tmp_path / "las"
    pc.mkdir()
    n = 3000
    write_las(str(pc / "t.las"),
              rng.random(n) * 50, rng.random(n) * 50, rng.random(n),
              np.full(n, 9))  # class 9 not in the map
    cmap = tmp_path / "cm.json"
    cmap.write_text(json.dumps({"2": 1}))
    data, labels = load_pointcloud_dir(
        str(pc), str(out), block_size=40, sample_num=1,
        class_map_file=str(cmap), min_num=10, las_dir=str(las_dir),
        features_output=["x", "y", "z"],
        features={"x": 0, "y": 1, "z": 2},
        calc_agl=False, num_points=128, sub_block_size=20,
        sub_sample_num=1, n_tries=1, seed=0,
    )
    assert len(data) == 0
