"""Feature-space visualisation.

Reference: /root/reference/visualisation.py — t-SNE scatter plots of
intermediate DGCNN features per block, coloured by predicted class
(:48-148), a depth sweep (:150-185), and DBSCAN clustering of features
exported to LAS ``pt_src_id`` (:16-46, :187-219). The reference file is
non-functional as committed (imports a nonexistent ``FugroDataset_eval``,
expects ``model()`` to return a tuple it never returns — SURVEY.md §2);
this implements the intended behaviour on the functional model's ``depth``
taps (models/dgcnn.py mirrors model.py:151-189).
"""

from __future__ import annotations

import os

import jax
import numpy as np

from dgcnn_tpu.models.dgcnn import DGCNNConfig, apply_dgcnn


def _block_features(
    params, bn_state, cfg: DGCNNConfig, points: np.ndarray, depth: int
) -> tuple[np.ndarray, np.ndarray]:
    """(features (N, C_d), predicted labels (N,)) for one block.
    One forward pass: ``with_logits=True`` returns the depth tap and the
    logits together instead of running the model twice."""
    x = np.asarray(points, np.float32)[None]
    (logits, feats), _ = apply_dgcnn(
        params, bn_state, x, cfg, depth=depth, with_logits=True
    )
    pred = np.asarray(jax.numpy.argmax(logits, -1))[0]
    f = np.asarray(feats)[0]
    if f.ndim == 1:  # depth 6: global vector — tile per point
        f = np.broadcast_to(f[None, :], (x.shape[1], f.shape[0]))
    return f, pred


def feature_tsne(
    params,
    bn_state,
    cfg: DGCNNConfig,
    blocks: list[np.ndarray],
    depth: int = 5,
    out_dir: str = "tsne",
    perplexity: float = 30.0,
    max_points: int = 2000,
    seed: int = 0,
) -> list[str]:
    """Per-block 2-D t-SNE scatter of depth-``depth`` features, coloured by
    predicted class. Returns written PNG paths."""
    from sklearn.manifold import TSNE

    os.makedirs(out_dir, exist_ok=True)
    written = []
    rng = np.random.default_rng(seed)
    for bi, block in enumerate(blocks):
        feats, pred = _block_features(params, bn_state, cfg, block, depth)
        n = len(feats)
        sel = rng.choice(n, min(max_points, n), replace=False)
        emb = TSNE(
            n_components=2, perplexity=min(perplexity, len(sel) - 1),
            init="pca", random_state=seed,
        ).fit_transform(feats[sel])
        path = os.path.join(out_dir, f"tsne_depth{depth}_block{bi}.png")
        _scatter(emb, pred[sel], f"depth {depth}, block {bi}", path)
        written.append(path)
    return written


def feature_tsne_all_layers(
    params, bn_state, cfg: DGCNNConfig, blocks, out_dir="tsne", **kw
) -> list[str]:
    """Depth sweep 1..9 (/root/reference/visualisation.py:150-185)."""
    written = []
    for depth in range(1, 10):
        written += feature_tsne(
            params, bn_state, cfg, blocks, depth=depth, out_dir=out_dir, **kw
        )
    return written


def generate_feature_map_clusters(
    params,
    bn_state,
    cfg: DGCNNConfig,
    block: np.ndarray,
    out_las: str,
    depth: int = 5,
    eps: float = 2.0,
    min_samples: int = 10,
) -> np.ndarray:
    """DBSCAN clusters in feature space written to LAS ``pt_src_id``
    (/root/reference/visualisation.py:16-46). Returns cluster labels."""
    from sklearn.cluster import DBSCAN

    from dgcnn_tpu.io.las import write_las

    feats, pred = _block_features(params, bn_state, cfg, block, depth)
    clusters = DBSCAN(eps=eps, min_samples=min_samples).fit_predict(feats)
    write_las(
        out_las,
        block[:, 0], block[:, 1], block[:, 2],
        pred.astype(np.uint8),
        point_source_id=(clusters + 1).astype(np.uint16),  # -1 noise -> 0
    )
    return clusters


def visualize(
    k: int,
    io,
    data_dir: str,
    kind: str = "tsne",
    depth: int = 5,
    out_dir: str = "visualisation",
    num_blocks: int = 1,
    num_points: int = 7000,
    num_classes: int = 5,
    num_features: int = 4,
    dropout: float = 0.5,
    emb_dims: int = 1024,
    model_label: str = "dgcnn_model",
    model_root: str = "checkpoints/dgcnn",
    knn_impl: str = "auto",
    seed: int = 1,
    validation_prop: float = 0.2,
    perplexity: float = 30.0,
    max_points: int = 2000,
    cluster_eps: float = 2.0,
    cluster_min_samples: int = 10,
) -> list[str]:
    """CLI driver: checkpoint + dataset blocks → feature visualisations.

    ``kind``: 'tsne' (per-block scatter at one depth), 'tsne_sweep'
    (depths 1-9, /root/reference/visualisation.py:150-185), or
    'clusters' (DBSCAN feature clusters → LAS pt_src_id, :16-46).
    Blocks come from the test split of ``data_dir`` exactly as
    ``--eval 1`` would draw them. Returns the written file paths.
    """
    from dgcnn_tpu.data.dataset import FugroDataset
    from dgcnn_tpu.eval.test import _restore

    if kind not in ("tsne", "tsne_sweep", "clusters"):
        raise ValueError(f"unknown visualisation kind {kind!r}")
    cfg = DGCNNConfig(
        num_classes=num_classes, num_features=num_features, k=k,
        dropout=dropout, emb_dims=emb_dims, knn_impl=knn_impl,
    )
    params, bn_state = _restore(cfg, model_root, model_label, io)
    dataset = FugroDataset(
        "test", data_dir, num_point=num_points, seed=seed,
        validation_prop=validation_prop, classes=range(num_classes),
    )
    blocks = [dataset[i][0] for i in range(min(num_blocks, len(dataset)))]
    io.cprint(
        f"visualize kind={kind} depth={depth}: {len(blocks)} block(s) "
        f"from {data_dir}")
    os.makedirs(out_dir, exist_ok=True)
    if kind == "tsne":
        written = feature_tsne(
            params, bn_state, cfg, blocks, depth=depth, out_dir=out_dir,
            perplexity=perplexity, max_points=max_points, seed=seed)
    elif kind == "tsne_sweep":
        written = feature_tsne_all_layers(
            params, bn_state, cfg, blocks, out_dir=out_dir,
            perplexity=perplexity, max_points=max_points, seed=seed)
    else:
        written = []
        for bi, block in enumerate(blocks):
            out_las = os.path.join(
                out_dir, f"clusters_depth{depth}_block{bi}.las")
            generate_feature_map_clusters(
                params, bn_state, cfg, block, out_las, depth=depth,
                eps=cluster_eps, min_samples=cluster_min_samples)
            written.append(out_las)
    for p in written:
        io.cprint(f"wrote {p}")
    return written


def _scatter(emb: np.ndarray, labels: np.ndarray, title: str, path: str):
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, ax = plt.subplots(figsize=(6, 6))
    sc = ax.scatter(emb[:, 0], emb[:, 1], c=labels, s=3, cmap="tab10")
    ax.set_title(title)
    fig.colorbar(sc, ax=ax, label="predicted class")
    fig.tight_layout()
    fig.savefig(path, dpi=120)
    plt.close(fig)
