"""Stage-3 fused-tail RAW-GRADIENT parity on the real chip.

exp_stage3_tail.py compared ADAM step-1 updates — a useless metric
(update ~ g/sqrt(g^2) = sign(g), so any f32-reassociation difference in
a near-zero gradient element reads as rel 2.0). This compares the raw
loss gradients kernel-vs-stock with proper relative norms, on device
(the CPU tests only exercise the kernel in interpret mode; this is the
Mosaic-compiled path with real RMW hazards).

    python scripts/exp_stage3_parity.py > /tmp/exp_stage3_parity.log 2>&1
"""

import os
import sys

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from dgcnn_tpu.utils.compilation_cache import (
    enable_persistent_compilation_cache,
)

enable_persistent_compilation_cache()

import jax
import jax.numpy as jnp
import numpy as np

from dgcnn_tpu.models.dgcnn import DGCNNConfig, apply_dgcnn, init_dgcnn
from dgcnn_tpu.ops.losses import masked_smoothed_cross_entropy

C, F, K, EMB, N, B = 5, 4, 30, 1024, 7000, 8


def log(*a):
    print(*a, flush=True)


def main():
    log("backend:", jax.default_backend(), jax.devices()[0].device_kind)
    from bench import make_blocks

    pts = jnp.asarray(make_blocks())
    labels = jax.random.randint(jax.random.key(2), (B, N), 0, C)
    mask = jnp.ones((B, N))

    grads = {}
    losses = {}
    for vi, impl in enumerate(("kernel", "stock")):
        os.environ["DGCNN_STAGE_TAIL_SCATTER"] = (
            "kernel" if impl == "kernel" else "other")
        cfg = DGCNNConfig(num_classes=C, num_features=F, k=K,
                          emb_dims=EMB, knn_impl="pallas_capped",
                          knn_query_chunk=8192 + vi)
        params, bn = init_dgcnn(jax.random.key(0), cfg)
        rng = jax.random.key(7)

        def loss_fn(p, cfg=cfg, bn=bn, rng=rng):
            logits, _ = apply_dgcnn(p, bn, pts, cfg, train=True, rng=rng)
            return masked_smoothed_cross_entropy(logits, labels, mask)

        l, g = jax.jit(jax.value_and_grad(loss_fn))(params)
        losses[impl] = float(l)
        grads[impl] = jax.tree.map(np.asarray, g)
    os.environ.pop("DGCNN_STAGE_TAIL_SCATTER", None)

    log(f"loss kernel={losses['kernel']:.9f} stock={losses['stock']:.9f}")
    worst_name, worst = None, 0.0
    flat_k, treedef = jax.tree.flatten(grads["kernel"])
    flat_s, _ = jax.tree.flatten(grads["stock"])
    names = [str(p) for p, _ in
             jax.tree_util.tree_flatten_with_path(grads["kernel"])[0]]
    for name, a, b in zip(names, flat_k, flat_s):
        denom = float(np.max(np.abs(b))) + 1e-20
        rel = float(np.max(np.abs(a - b))) / denom
        l2 = float(np.linalg.norm(a - b) / (np.linalg.norm(b) + 1e-20))
        log(f"  {name}: max-rel {rel:.3e}  l2-rel {l2:.3e}")
        if rel > worst:
            worst, worst_name = rel, name
    log(f"worst max-rel: {worst:.3e} at {worst_name}")
    log("DONE")


if __name__ == "__main__":
    main()
