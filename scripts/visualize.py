"""CLI for feature-space visualisation (reference visualisation.py usage):
t-SNE scatters of intermediate DGCNN features and DBSCAN cluster LAS export.

Examples:
  python scripts/visualize.py tsne --room data/npy/Area_1.npy \
      --model_root ckpt --num_classes 3 --num_features 4 --k 6 \
      --emb_dims 32 --depth 5 --out_dir tsne/
  python scripts/visualize.py clusters --room data/npy/Area_1.npy ... \
      --out_las clusters.las
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser(description="DGCNN feature visualisation")
    ap.add_argument("mode", choices=["tsne", "tsne_all", "clusters"])
    ap.add_argument("--room", required=True, help=".npy room file")
    ap.add_argument("--model_root", required=True)
    ap.add_argument("--model_label", default="dgcnn_model")
    ap.add_argument("--num_classes", type=int, default=5)
    ap.add_argument("--num_features", type=int, default=4)
    ap.add_argument("--k", type=int, default=30)
    ap.add_argument("--emb_dims", type=int, default=1024)
    ap.add_argument("--depth", type=int, default=5)
    ap.add_argument("--num_points", type=int, default=2000)
    ap.add_argument("--out_dir", default="tsne")
    ap.add_argument("--out_las", default="clusters.las")
    ap.add_argument("--eps", type=float, default=2.0)
    ap.add_argument("--min_samples", type=int, default=10)
    args = ap.parse_args()

    from dgcnn_tpu.eval.test import _restore
    from dgcnn_tpu.models.dgcnn import DGCNNConfig
    from dgcnn_tpu.utils.logging import IOStream
    from dgcnn_tpu.viz.features import (
        feature_tsne,
        feature_tsne_all_layers,
        generate_feature_map_clusters,
    )

    cfg = DGCNNConfig(num_classes=args.num_classes,
                      num_features=args.num_features, k=args.k,
                      emb_dims=args.emb_dims)
    io = IOStream(os.path.join(args.out_dir if args.mode != "clusters"
                               else ".", "viz.log"))
    params, bn_state = _restore(cfg, args.model_root, args.model_label, io)

    room = np.load(args.room)
    pts = room[:, : args.num_features].astype(np.float32)
    if len(pts) > args.num_points:
        sel = np.random.default_rng(0).choice(
            len(pts), args.num_points, replace=False)
        pts = pts[sel]

    if args.mode == "tsne":
        out = feature_tsne(params, bn_state, cfg, [pts], depth=args.depth,
                           out_dir=args.out_dir)
    elif args.mode == "tsne_all":
        out = feature_tsne_all_layers(params, bn_state, cfg, [pts],
                                      out_dir=args.out_dir)
    else:
        clusters = generate_feature_map_clusters(
            params, bn_state, cfg, pts, args.out_las, depth=args.depth,
            eps=args.eps, min_samples=args.min_samples)
        out = [f"{args.out_las} ({len(np.unique(clusters))} clusters)"]
    for p in out:
        print(p)


if __name__ == "__main__":
    main()
