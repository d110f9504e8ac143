"""Offline dataset assembly: raw LAS/HDF5 tiles → training-ready .npy rooms.

Reference flow (/root/reference/prepare_data/process_data.py:161-552):
per raw file → 100 m blocks (all points) → class remap → per-block DTM+AGL
→ rejection-sample 30 m sub-blocks of num_points until ``sample_num`` pass
a per-class minimum-count test → write Area_{n}.las + Area_{n}.txt →
re-split into per-class S3DIS-style annotation files → aggregate each room
into a min-corner-shifted (N, F+1) .npy → write meta indexes.

Same stages and artifacts here, with the host-side hot loops vectorised
(window queries via the sorted-x index in blocks.py, LUT class remap) and
deterministic seeding.
"""

from __future__ import annotations

import glob
import json
import os

import numpy as np

from dgcnn_tpu.io.las import save_las_pointcloud
from dgcnn_tpu.prepare.blocks import room2blocks
from dgcnn_tpu.prepare.dtm import build_dtm, gen_agl
from dgcnn_tpu.prepare.labels import convert_pc_labels, load_class_map
from dgcnn_tpu.prepare.loaders import load_pointcloud


def load_pointcloud_dir(
    dir: str,
    outdir: str,
    block_size: float = 100,
    sample_num: int = 5,
    class_map_file: str = "params/class_map.json",
    min_num: int = 100,
    las_dir: str = "converted-pcs",
    features_output: list[str] | None = None,
    features: dict[str, int] | None = None,
    calc_agl: bool = True,
    cell_size: float = 1,
    desired_seed_cell_size: float = 90,
    boundary_block_width: int = 5,
    detect_water: bool = False,
    remove_buildings: bool = True,
    output_tin_file_path: str | None = None,
    dtm_buffer: float = 6,
    dtm_module_path: str = "",
    num_points: int = 7000,
    sub_block_size: float = 30,
    use_all_points: bool = False,
    sub_sample_num: int = 10,
    n_tries: int = 10,
    seed: int = 0,
) -> tuple[np.ndarray, np.ndarray]:
    """Sample qualifying sub-blocks from every .las/.h5 file in ``dir``.

    Writes each accepted sub-block as ``{las_dir}/Area_{n}.las`` and
    ``{outdir}/Area_{n}.txt`` (features + label column). Returns the stacked
    (B, num_points, F) data and (B, num_points) labels.
    (/root/reference/prepare_data/process_data.py:161-320. One deviation:
    the reference writes the AGL column as the LAS ``z`` of the visualisation
    tiles when calc_agl is on (process_data.py:280-281); here the LAS keeps
    the true z — the .txt/.npy training artifacts are identical either way.)
    """
    rng = np.random.default_rng(seed)
    features = {k.lower(): v for k, v in (features or {}).items()}
    features_output = [f.lower() for f in (features_output or [])]
    class_map = load_class_map(class_map_file)
    classes = sorted(set(class_map.values()))
    print("CLASSES: ", classes)

    os.makedirs(las_dir, exist_ok=True)
    os.makedirs(outdir, exist_ok=True)
    files = sorted(
        f for f in os.listdir(dir) if f.rsplit(".", 1)[-1] in ("h5", "las")
    )
    data_out, label_out = [], []
    tile_num = 0
    min_frac = (sub_block_size ** 2) / (block_size ** 2)
    agl_col = features.get("agl")

    for fname in files:
        whole_data, whole_labels = load_pointcloud(
            os.path.join(dir, fname), features_output=features_output,
            features=features,
        )
        blocks, block_labels = room2blocks(
            whole_data, whole_labels, 100000, block_size=block_size,
            stride=block_size / 2, random_sample=False, use_all_points=True,
            rng=rng,
        )
        for bi in range(len(blocks)):
            bdata, blabels = convert_pc_labels(
                blocks[bi], block_labels[bi], class_map
            )
            if len(bdata) == 0:
                continue
            if calc_agl and agl_col is not None and "agl" in features_output:
                xyz_cols = [features["x"], features["y"], features["z"]]
                dtm = build_dtm(
                    bdata[:, xyz_cols],
                    module_path=dtm_module_path,
                    cell_size=cell_size,
                    desired_seed_cell_size=desired_seed_cell_size,
                    boundary_block_width=boundary_block_width,
                    detect_water=detect_water,
                    remove_buildings=remove_buildings,
                    output_tin_file_path=output_tin_file_path,
                    dtm_buffer=dtm_buffer,
                )
                bdata[:, agl_col] = gen_agl(dtm, bdata[:, xyz_cols])

            found, tries = 0, 0
            while found < sample_num and tries <= n_tries:
                tries += 1
                want = sub_sample_num - found
                if want <= 0:
                    break
                sub_d, sub_l = room2blocks(
                    bdata, blabels, num_points, block_size=sub_block_size,
                    stride=sub_block_size / 2, random_sample=True,
                    sample_num=want, use_all_points=use_all_points, rng=rng,
                )
                for si in range(len(sub_d)):
                    sd, sl = sub_d[si], sub_l[si]
                    counts = [np.sum(sl == c) for c in classes]
                    if not all(c > min_num * min_frac for c in counts):
                        continue
                    found += 1
                    save_las_pointcloud(
                        sd, sl, os.path.join(las_dir, f"Area_{tile_num}.las"),
                        features_output=features_output, features=features,
                    )
                    np.savetxt(
                        os.path.join(outdir, f"Area_{tile_num}.txt"),
                        np.hstack([sd, sl.reshape(-1, 1)]),
                    )
                    data_out.append(sd)
                    label_out.append(sl)
                    tile_num += 1
    if not data_out:
        return np.zeros((0, num_points, 1)), np.zeros((0, num_points))
    return np.stack(data_out), np.stack(label_out)


def extract_annotations(
    area: str,
    data_folder: str,
    output_path: str,
    categories: dict[float, str],
    features: dict[str, int],
    features_output: list[str],
) -> None:
    """Re-split tile text files into per-class annotation files (S3DIS
    layout; /root/reference/prepare_data/process_data.py:350-407)."""
    os.makedirs(output_path, exist_ok=True)
    features = {k.lower(): v for k, v in features.items()}
    features_output = [f.lower() for f in features_output]
    room_files = sorted(glob.glob(os.path.join(data_folder, "*.txt")))
    for i, room_file in enumerate(room_files):
        room_id = i + 1
        room_dir = os.path.join(output_path, f"Area_{room_id}", area)
        os.makedirs(room_dir, exist_ok=True)
        room_data = np.loadtxt(room_file)
        if room_data.ndim == 1:
            room_data = room_data[None]
        labels = room_data[:, -1]
        out = np.stack(
            [room_data[:, features[f]] for f in features_output], axis=1
        )
        np.savetxt(
            os.path.join(room_dir, f"{area}_{room_id}.txt"), out, fmt="%.3f"
        )
        anno = os.path.join(room_dir, "Annotations")
        os.makedirs(anno, exist_ok=True)
        for cat in np.unique(labels):
            sel = labels == cat
            name = categories.get(float(cat), f"class_{int(cat)}")
            np.savetxt(
                os.path.join(anno, f"{name}.txt"), out[sel], fmt="%.3f"
            )


def write_anno_paths(processed_dir: str, root_dir: str) -> list[str]:
    """Index annotation dirs (processed/Area_N/<area>/Annotations) into
    meta/anno_paths.txt (/root/reference/prepare_data/
    process_data.py:409-423; the reference globs a hardcoded 'processed'
    subdir of base_dir — here the processed dir is passed explicitly)."""
    meta = os.path.join(root_dir, "meta")
    os.makedirs(meta, exist_ok=True)
    paths = sorted(
        p.replace("\\", "/")
        for p in glob.glob(os.path.join(processed_dir, "*", "*",
                                        "Annotations"))
    )
    with open(os.path.join(meta, "anno_paths.txt"), "w") as f:
        f.write("\n".join(paths) + ("\n" if paths else ""))
    return paths


def collect_point_label(anno_path: str, out_file: str,
                        categories: dict[float, str]) -> None:
    """Aggregate one room's per-class annotation files into a single
    min-corner-shifted (N, F+1) array saved as .npy
    (/root/reference/prepare_data/pointcloud_util.py:13-60)."""
    name_to_label = {v: int(k) for k, v in categories.items()}
    rows = []
    for f in sorted(glob.glob(os.path.join(anno_path, "*.txt"))):
        cls_name = os.path.basename(f).split(".")[0]
        label = name_to_label.get(cls_name)
        if label is None:
            continue
        pts = np.loadtxt(f)
        if pts.ndim == 1:
            pts = pts[None]
        rows.append(np.hstack([pts, np.full((len(pts), 1), label, float)]))
    if not rows:
        return
    data = np.vstack(rows)
    data[:, 0:3] -= data[:, 0:3].min(axis=0)
    np.save(out_file, data)


def collect_3d_data(root_dir: str, output_folder: str,
                    categories: dict[float, str]) -> None:
    """meta/anno_paths.txt entries → Area_*.npy room files
    (/root/reference/prepare_data/process_data.py:425-440)."""
    anno_file = os.path.join(root_dir, "meta", "anno_paths.txt")
    with open(anno_file) as f:
        anno_paths = [line.strip() for line in f if line.strip()]
    os.makedirs(output_folder, exist_ok=True)
    for p in anno_paths:
        parts = p.rstrip("/").split("/")
        out_name = f"{parts[-3]}_{parts[-2]}.npy"
        collect_point_label(
            p, os.path.join(output_folder, out_name), categories
        )


def write_npy_file_names(root_dir: str, data_path: str) -> None:
    """Index .npy rooms into meta/all_data_label.txt
    (/root/reference/prepare_data/process_data.py:442-456)."""
    files = sorted(
        os.path.basename(f) for f in glob.glob(os.path.join(data_path, "*.npy"))
    )
    meta = os.path.join(root_dir, "meta")
    os.makedirs(meta, exist_ok=True)
    with open(os.path.join(meta, "all_data_label.txt"), "w") as f:
        f.write("\n".join(files) + ("\n" if files else ""))


def process_data(
    base_dir: str,
    root_folder: str,
    pc_folder: str,
    data_folder: str,
    processed_data_folder: str,
    npy_data_folder: str,
    area: str,
    categories_file: str,
    features_file: str,
    features_output: list[str],
    block_size: float,
    sample_num: int,
    min_class_num: int,
    class_map_file: str,
    calc_agl: bool,
    cell_size: float,
    desired_seed_cell_size: float,
    boundary_block_width: int,
    detect_water: bool,
    remove_buildings: bool,
    output_tin_file_path: str | None,
    dtm_buffer: float,
    dtm_module_path: str,
    num_points: int,
    sub_block_size: float,
    use_all_points: bool,
    sub_sample_num: int,
    n_tries: int,
    seed: int = 0,
) -> None:
    """End-to-end preprocessing orchestration
    (/root/reference/prepare_data/process_data.py:458-552)."""
    with open(categories_file) as f:
        categories = {float(k): v for k, v in json.load(f).items()}
    with open(features_file) as f:
        features = json.load(f)

    os.makedirs(base_dir, exist_ok=True)
    os.makedirs(data_folder, exist_ok=True)

    print("Loading pointcloud data")
    load_pointcloud_dir(
        pc_folder, data_folder,
        block_size=block_size, sample_num=sample_num, min_num=min_class_num,
        class_map_file=class_map_file, features_output=features_output,
        features=features, calc_agl=calc_agl, cell_size=cell_size,
        desired_seed_cell_size=desired_seed_cell_size,
        boundary_block_width=boundary_block_width,
        detect_water=detect_water, remove_buildings=remove_buildings,
        output_tin_file_path=output_tin_file_path, dtm_buffer=dtm_buffer,
        dtm_module_path=dtm_module_path, num_points=num_points,
        sub_block_size=sub_block_size, use_all_points=use_all_points,
        sub_sample_num=sub_sample_num, n_tries=n_tries, seed=seed,
        las_dir=os.path.join(base_dir, "converted-pcs"),
    )
    print("Extracting annotations...")
    extract_annotations(
        area, data_folder, processed_data_folder, categories, features,
        features_output,
    )
    print("Writing annotation paths...")
    write_anno_paths(processed_data_folder, root_folder)
    print("Collecting NPY data...")
    collect_3d_data(root_folder, npy_data_folder, categories)
    print("Writing NPY data...")
    write_npy_file_names(root_folder, npy_data_folder)
