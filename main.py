#!/usr/bin/env python
"""CLI front-end — flag-compatible with the reference's main.py.

Modes (/root/reference/main.py:119-136):
  --mode classifier --eval 0   train a DGCNN           (train_args)
  --mode classifier --eval 1   evaluate a checkpoint    (test_args)
  --mode classifier --predict <las>  whole-cloud LAS->LAS prediction
  --mode process_data          offline dataset assembly (process_data)
  --mode visualize             feature t-SNE / DBSCAN clusters from a
                               checkpoint (visualisation.py:16-219)

Flag names follow /root/reference/main.py:43-102 (boolean flags use a real
str2bool parser instead of the reference's ``type=bool`` truthy-string
trap). TPU-specific additions: --knn_impl {xla,approx,pallas},
--compute_dtype, --predict/--predict_out.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

ROOT_DIR = os.path.dirname(os.path.abspath(__file__))
CLASS_MAP_FILE = os.path.join(ROOT_DIR, "params", "class_map.json")


def str2bool(v) -> bool:
    if isinstance(v, bool):
        return v
    if str(v).lower() in ("yes", "true", "t", "y", "1"):
        return True
    if str(v).lower() in ("no", "false", "f", "n", "0"):
        return False
    raise argparse.ArgumentTypeError(f"boolean value expected, got {v!r}")


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="DGCNN-TPU Interface")
    AREA = "Training"
    BASE_DIR = os.path.join(os.getcwd(), "Datasets")

    # interface
    p.add_argument("--eval", type=str2bool, default=False)
    p.add_argument("--mode", type=str, default="classifier",
                   choices=["classifier", "process_data", "visualize"])
    p.add_argument("--predict", type=str, default="",
                   help="point cloud file for whole-cloud prediction")
    p.add_argument("--predict_out", type=str, default="pc_pred.las")
    p.add_argument("--classify_all", type=str2bool, default=False,
                   help="label every point (not a num_points subsample per "
                        "block) during --predict")
    p.add_argument("--point_shards", type=int, default=1,
                   help="shard the point axis over this many devices "
                        "(ring-kNN sequence parallelism). Predict: the "
                        "WHOLE cloud classifies as one block instead of "
                        "30 m tiling. Train (--eval 0): point-sharded "
                        "training for whole-cloud fine-tuning (plain "
                        "step only — grad_accum/remat/device_masks/"
                        "tensor_parallel are rejected)")

    # multi-host (run the SAME command on every host, one process each)
    p.add_argument("--coordinator_address", type=str, default="",
                   help="host:port of process 0's jax.distributed "
                        "coordinator; enables multi-host initialisation")
    p.add_argument("--num_processes", type=int, default=1,
                   help="total processes in the multi-host job")
    p.add_argument("--process_id", type=int, default=0,
                   help="this process's rank in [0, num_processes)")

    # train/test
    p.add_argument("--data_dir", type=str, default="")
    p.add_argument("--tb_dir", type=str, default="log_tensorboard")
    p.add_argument("--exp_name", type=str, default="dgcnn_tpu")
    p.add_argument("--model", type=str, default="dgcnn", choices=["dgcnn"])
    p.add_argument("--block_size", type=float, default=30.0)
    p.add_argument("--num_classes", type=int, default=5)
    p.add_argument("--num_features", type=int, default=3)
    p.add_argument("--validation_area", type=str, default="1")
    p.add_argument("--batch_size", type=int, default=12)
    p.add_argument("--validation_batch_size", type=int, default=12)
    p.add_argument("--test_batch_size", type=int, default=8)
    p.add_argument("--epochs", type=int, default=50)
    p.add_argument("--use_sgd", type=str2bool, default=False)
    p.add_argument("--lr", type=float, default=0.001)
    p.add_argument("--momentum", type=float, default=0.9)
    p.add_argument("--scheduler", type=str, default="cos",
                   choices=["cos", "step", "none"])
    p.add_argument("--seed", type=int, default=1)
    p.add_argument("--dropout", type=float, default=0.5)
    p.add_argument("--emb_dims", type=int, default=1024)
    p.add_argument("--k", type=int, default=20)
    p.add_argument("--model_root", type=str, default="checkpoints/dgcnn")
    p.add_argument("--test_visu_dir", default="predict")
    p.add_argument("--validation_prop", type=float, default=0.2)
    p.add_argument("--sample_num", type=int, default=5)
    p.add_argument("--exclude_classes", nargs="*", type=int, default=[-1])
    p.add_argument("--min_class_num", type=int, default=100)
    p.add_argument("--model_label", type=str, default="dgcnn_model")
    p.add_argument("--min_class_confidence", type=float, default=0.8)
    p.add_argument("--patience", type=int, default=None,
                   help="early-stop after N epochs without validation "
                        "improvement")

    # TPU knobs
    p.add_argument("--knn_impl", type=str, default="auto",
                   choices=["auto", "xla", "approx", "pallas",
                            "pallas_packed", "pallas_capped"])
    p.add_argument("--knn_band", type=int, default=None,
                   help="banded stage-1 kNN: score only this many x-sorted "
                        "rows around each query tile (certified + exactly "
                        "repaired; kernels/knn_pallas.py). Unset = the "
                        "DGCNNConfig default; 0 disables")
    p.add_argument("--knn_band_feature", type=int, default=None,
                   help="banded FEATURE-space kNN for stage 2: score only "
                        "this many rows (spatial order localises the "
                        "learned features; uncertified, trained-model "
                        "evidenced — kernels/knn_pallas.py). Unset = the "
                        "DGCNNConfig default; 0 disables")
    p.add_argument("--knn_band_recall_guard", type=int, default=None,
                   help="runtime recall guard for the uncertified feature "
                        "bands: probe-query count re-solved with the full "
                        "capped kernel each call; sampled recall below "
                        "--knn_band_recall_threshold falls the batch back "
                        "to the full kernel and warns. Unset = the "
                        "DGCNNConfig default (256); 0 disables")
    p.add_argument("--knn_band_recall_threshold", type=float, default=None,
                   help="recall threshold for --knn_band_recall_guard "
                        "(default 0.995)")
    p.add_argument("--knn_band_guard_every", type=int, default=None,
                   help="AMORTIZE the feature-band recall guard: run the "
                        "probe kernels only on every Nth dispatch, with a "
                        "sticky host-side fallback to the full capped "
                        "kernel for the rest of the loop (train: rest of "
                        "the epoch) when a guarded dispatch trips. Unset = "
                        "the DGCNNConfig default; 1 guards every dispatch")
    p.add_argument("--knn_share_stage3", type=str2bool, default=False,
                   help="reuse stage 2's neighbour graph for stage 3 "
                        "instead of re-kNN'ing in x2 feature space (the "
                        "'static graph' DGCNN approximation) — one fewer "
                        "kNN per forward; changes predictions, opt-in "
                        "(BASELINE.md records trained-model agreement)")
    p.add_argument("--ring_band_shards", type=int, default=None,
                   help="banded ring kNN for --point_shards: visit only "
                        "the 2s+1 ring-adjacent shards, certified exact "
                        "with full-ring fallback (parallel/ring_knn.py). "
                        "Unset = the DGCNNConfig default (1); 0 disables")
    p.add_argument("--compute_dtype", type=str, default=None)
    p.add_argument("--matmul_precision", type=str, default=None,
                   choices=[None, "default", "high", "highest"],
                   help="XLA matmul precision; 'highest' is the TPU "
                        "parity mode (~1e-4 prob drift vs f32 reference)")
    p.add_argument("--remat", type=str, default="off",
                   choices=["off", "selective", "full"],
                   help="forward rematerialisation in the train backward: "
                        "'selective' recomputes k-expanded stage tensors "
                        "(low memory, enables larger batches); 'full' is "
                        "jax.checkpoint nothing_saveable")
    p.add_argument("--knn_train_unroll", type=str, default="auto",
                   choices=["auto", "0", "1", "false", "true"],
                   help="python-unroll the capped kNN kernel in the train "
                        "step too (~5% faster steps; ~10 min one-time "
                        "compile, amortised by the persistent cache). "
                        "'auto' unrolls exactly when a previous run of "
                        "this config seeded the cache-warm marker")
    p.add_argument("--grad_accum", type=int, default=1,
                   help="micro-batches per optimizer step: batch_size is "
                        "split this many ways and gradients accumulate in "
                        "a lax.scan — effective batches beyond the "
                        "single-program compile ceiling")
    p.add_argument("--tensor_parallel", type=int, default=1,
                   help="shard the conv6/bn6/conv7 trunk channels over "
                        "this many devices (Megatron column->row style, "
                        "parallel/tensor_parallel.py); the remaining "
                        "devices form the data axis. emb_dims and 192 "
                        "must be divisible by it")

    # visualisation (--mode visualize; /root/reference/visualisation.py)
    p.add_argument("--viz_kind", type=str, default="tsne",
                   choices=["tsne", "tsne_sweep", "clusters"],
                   help="per-block feature t-SNE at --viz_depth, a depth "
                        "1-9 sweep, or DBSCAN feature clusters written to "
                        "LAS pt_src_id")
    p.add_argument("--viz_depth", type=int, default=5,
                   help="model depth tap (1-9) to visualise")
    p.add_argument("--viz_dir", type=str, default="visualisation")
    p.add_argument("--viz_blocks", type=int, default=1,
                   help="number of test-split blocks to visualise")
    p.add_argument("--viz_max_points", type=int, default=2000,
                   help="points subsampled per block for t-SNE")
    p.add_argument("--viz_perplexity", type=float, default=30.0)
    p.add_argument("--viz_cluster_eps", type=float, default=2.0,
                   help="DBSCAN eps for --viz_kind clusters")
    p.add_argument("--viz_cluster_min_samples", type=int, default=10)

    # preprocessing
    p.add_argument("--base_dir", type=str, default=os.path.join(BASE_DIR, AREA))
    p.add_argument("--root_dir", type=str, default=ROOT_DIR)
    p.add_argument("--area", type=str, default=AREA)
    p.add_argument("--pc_folder", type=str, default="")
    p.add_argument("--data_folder", type=str, default="data")
    p.add_argument("--processed_data_folder", type=str,
                   default=os.path.join(BASE_DIR, AREA, "processed"))
    p.add_argument("--categories_file", type=str,
                   default=os.path.join(ROOT_DIR, "params/categories.json"))
    p.add_argument("--features_file", type=str,
                   default=os.path.join(ROOT_DIR, "params/features.json"))
    p.add_argument("--class_map_file", type=str, default=CLASS_MAP_FILE)
    p.add_argument("--features_output", nargs="*", type=str,
                   default=["x", "y", "z", "agl"])
    p.add_argument("--npy_data_folder", type=str,
                   default=os.path.join(BASE_DIR, "data_as_S3DIS_NRI_NPY"))
    p.add_argument("--calc_agl", type=str2bool, default=True)
    p.add_argument("--cell_size", type=float, default=1)
    p.add_argument("--desired_seed_cell_size", type=float, default=90)
    p.add_argument("--boundary_block_width", type=int, default=5)
    p.add_argument("--detect_water", type=str2bool, default=False)
    p.add_argument("--remove_buildings", type=str2bool, default=True)
    p.add_argument("--output_tin_file_path", type=str, default=None)
    p.add_argument("--dtm_buffer", type=float, default=6)
    p.add_argument("--dtm_module_path", type=str, default="")
    p.add_argument("--num_points", type=int, default=7000)
    p.add_argument("--sub_block_size", type=float, default=30)
    p.add_argument("--use_all_points", type=str2bool, default=False)
    p.add_argument("--sub_sample_num", type=int, default=5)
    p.add_argument("--n_tries", type=int, default=10)
    return p


def _snapshot_run_config(args) -> None:
    """Reproducibility snapshot: full flag values + code revision into the
    experiment dir (replaces the reference's source-file copying,
    /root/reference/main.py:28-31 — the git hash identifies the code)."""
    import json
    import subprocess

    try:
        rev = subprocess.run(
            ["git", "-C", ROOT_DIR, "rev-parse", "HEAD"],
            capture_output=True, text=True, timeout=10,
        ).stdout.strip()
    except Exception:
        rev = "unknown"
    snap = {"git_revision": rev, "args": vars(args)}
    with open(f"checkpoints/{args.exp_name}/run_config.json", "w") as f:
        json.dump(snap, f, indent=1, default=str)


def parse_cli(argv):
    """Parse a CLI argv list, honouring ``--config file.json`` (JSON of
    flag defaults; explicit CLI flags win)."""
    argv = list(argv)
    if "--config" in argv:
        import json

        i = argv.index("--config")
        path = argv[i + 1]
        del argv[i : i + 2]
        with open(path) as f:
            conf = json.load(f)
        parser = build_parser()
        parser.set_defaults(**conf)
        return parser.parse_args(argv)
    return build_parser().parse_args(argv)


def main(argv=None):
    from dgcnn_tpu.utils.compilation_cache import (
        enable_persistent_compilation_cache,
    )

    enable_persistent_compilation_cache()
    import sys as _sys

    args = parse_cli(_sys.argv[1:] if argv is None else argv)

    # Multi-host lifecycle from the SAME one CLI (the reference drives
    # everything from main.py, /root/reference/main.py:33-136): launch
    # this exact command once per host with a distinct --process_id.
    # Must run before anything touches a JAX backend.
    proc_idx = 0
    if args.num_processes > 1 or args.coordinator_address:
        from dgcnn_tpu.parallel.distributed import initialize

        dist = initialize(
            coordinator_address=args.coordinator_address or None,
            num_processes=args.num_processes,
            process_id=args.process_id,
        )
        proc_idx = dist["process_index"]
        print(f"distributed: process {dist['process_index']}/"
              f"{dist['process_count']}, {dist['local_devices']} local / "
              f"{dist['global_devices']} global devices", flush=True)
        if dist["process_count"] > 1 and not (
                args.mode == "classifier" and not args.eval
                and not args.predict):
            # only train() has multi-host collectives/guards; every other
            # mode would run the full single-process path on EVERY
            # process, racing on shared output files
            raise SystemExit(
                "multi-host (--num_processes > 1) supports training only "
                "(--mode classifier --eval 0); run eval/predict/"
                "process_data/visualize single-process")

    from dgcnn_tpu.utils.logging import IOStream

    os.makedirs(f"checkpoints/{args.exp_name}/models", exist_ok=True)
    # per-process log file: concurrent appends from several hosts would
    # interleave mid-line on a shared filesystem
    log_name = "run.log" if proc_idx == 0 else f"run.p{proc_idx}.log"
    io = IOStream(f"checkpoints/{args.exp_name}/{log_name}")
    io.cprint(str(args))
    if proc_idx == 0:
        _snapshot_run_config(args)

    if args.mode == "classifier":
        if args.predict:
            from dgcnn_tpu.eval.predict import predict

            kwargs = dict(
                num_points=args.num_points, block_size=args.block_size,
                num_classes=args.num_classes, num_features=args.num_features,
                dropout=args.dropout, emb_dims=args.emb_dims,
                min_class_confidence=args.min_class_confidence,
                model_label=args.model_label, model_root=args.model_root,
                knn_impl=args.knn_impl, knn_band=args.knn_band,
                knn_band_feature=args.knn_band_feature,
                knn_band_recall_guard=args.knn_band_recall_guard,
                knn_band_recall_threshold=args.knn_band_recall_threshold,
                knn_band_guard_every=args.knn_band_guard_every,
                knn_share_stage3=args.knn_share_stage3,
                compute_dtype=args.compute_dtype,
                matmul_precision=args.matmul_precision,
                classify_all=args.classify_all,
                point_shards=args.point_shards,
                ring_band_shards=args.ring_band_shards,
            )
            if os.path.isdir(args.predict):
                # directory mode: classify every .las/.h5, mirrored names
                os.makedirs(args.predict_out, exist_ok=True)
                for f in sorted(os.listdir(args.predict)):
                    if f.rsplit(".", 1)[-1] not in ("las", "h5"):
                        continue
                    out = os.path.join(
                        args.predict_out,
                        f.rsplit(".", 1)[0] + "_classified.las",
                    )
                    predict(args.k, io, os.path.join(args.predict, f),
                            out, **kwargs)
            else:
                predict(args.k, io, args.predict, args.predict_out, **kwargs)
        elif not args.eval:
            args.remat = {"off": False, "full": True,
                          "selective": "selective"}[args.remat]
            from dgcnn_tpu.train.loop import train_args

            train_args(args, io)
        else:
            from dgcnn_tpu.eval.test import test_args

            test_args(args, io)
    elif args.mode == "process_data":
        from dgcnn_tpu.prepare.pipeline import process_data

        process_data(
            args.base_dir, args.root_dir, args.pc_folder, args.data_folder,
            args.processed_data_folder, args.npy_data_folder, args.area,
            args.categories_file, args.features_file, args.features_output,
            args.block_size, args.sample_num, args.min_class_num,
            args.class_map_file, args.calc_agl, args.cell_size,
            args.desired_seed_cell_size, args.boundary_block_width,
            args.detect_water, args.remove_buildings,
            args.output_tin_file_path, args.dtm_buffer, args.dtm_module_path,
            args.num_points, args.sub_block_size, args.use_all_points,
            args.sub_sample_num, args.n_tries, seed=args.seed,
        )
    elif args.mode == "visualize":
        from dgcnn_tpu.viz.features import visualize

        visualize(
            args.k, io, args.data_dir,
            kind=args.viz_kind, depth=args.viz_depth, out_dir=args.viz_dir,
            num_blocks=args.viz_blocks, num_points=args.num_points,
            num_classes=args.num_classes, num_features=args.num_features,
            dropout=args.dropout, emb_dims=args.emb_dims,
            model_label=args.model_label, model_root=args.model_root,
            knn_impl=args.knn_impl, seed=args.seed,
            validation_prop=args.validation_prop,
            perplexity=args.viz_perplexity, max_points=args.viz_max_points,
            cluster_eps=args.viz_cluster_eps,
            cluster_min_samples=args.viz_cluster_min_samples,
        )
    else:
        raise SystemExit(f"Invalid operation mode {args.mode!r}")


if __name__ == "__main__":
    main()
