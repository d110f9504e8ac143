"""CLI for the directory-watching classification service.

    python -m dgcnn_tpu.serve --model_root ckpt/ --in_dir landing/ \
        --out_dir classified/ [--once] [--http_port 8800] ...

Model/tiling flags mirror ``main.py`` predict mode
(/root/reference/test.py:223-332 parameters).
"""

from __future__ import annotations

import argparse
import sys

from dgcnn_tpu.serve.service import (
    PredictService,
    serve_directory,
    start_status_server,
)
from dgcnn_tpu.utils.logging import IOStream


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser("dgcnn_tpu.serve")
    p.add_argument("--in_dir", required=True)
    p.add_argument("--out_dir", required=True)
    p.add_argument("--failed_dir", default=None)
    p.add_argument("--poll_s", type=float, default=2.0)
    p.add_argument("--once", action="store_true",
                   help="drain the current backlog and exit")
    p.add_argument("--max_tiles", type=int, default=None)
    p.add_argument("--settle_s", type=float, default=1.0,
                   help="ignore tiles modified less than this many seconds ago (half-written uploads)")
    p.add_argument("--http_port", type=int, default=None,
                   help="optional localhost status endpoint")
    p.add_argument("--log", default=None, help="log file (default stderr)")
    # model / tiling (main.py names)
    p.add_argument("--model_root", default="checkpoints/dgcnn")
    p.add_argument("--model_label", default="dgcnn_model")
    p.add_argument("--k", type=int, default=30)
    p.add_argument("--num_points", type=int, default=7000)
    p.add_argument("--block_size", type=float, default=30.0)
    p.add_argument("--num_classes", type=int, default=5)
    p.add_argument("--num_features", type=int, default=4)
    p.add_argument("--emb_dims", type=int, default=1024)
    p.add_argument("--test_batch_size", type=int, default=8)
    p.add_argument("--min_class_confidence", type=float, default=0.8)
    p.add_argument("--classify_all", action="store_true")
    p.add_argument("--point_shards", type=int, default=1,
                   help="classify each tile whole (no 30 m tiling) with "
                        "the point axis sharded over this many devices")
    p.add_argument("--knn_impl", default="auto")
    p.add_argument("--compute_dtype", default=None)
    p.add_argument("--matmul_precision", default=None)
    return p


def main(argv=None) -> int:
    from dgcnn_tpu.utils.compilation_cache import (
        enable_persistent_compilation_cache,
    )

    enable_persistent_compilation_cache()
    args = build_parser().parse_args(argv)
    io = IOStream(args.log) if args.log else IOStream(
        "/dev/null", stream=sys.stderr)
    service = PredictService(
        args.k, io=io,
        num_points=args.num_points, block_size=args.block_size,
        num_classes=args.num_classes, num_features=args.num_features,
        emb_dims=args.emb_dims,
        min_class_confidence=args.min_class_confidence,
        model_root=args.model_root, model_label=args.model_label,
        batch_size=args.test_batch_size, knn_impl=args.knn_impl,
        compute_dtype=args.compute_dtype,
        matmul_precision=args.matmul_precision,
        classify_all=args.classify_all,
        point_shards=args.point_shards,
    )
    if args.http_port:
        start_status_server(service, args.http_port)
    n = serve_directory(
        service, args.in_dir, args.out_dir, poll_s=args.poll_s,
        once=args.once, failed_dir=args.failed_dir,
        max_tiles=args.max_tiles, settle_s=args.settle_s,
    )
    io.cprint(f"served {n} tiles "
              f"({service.processed} ok, {service.failed} failed)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
