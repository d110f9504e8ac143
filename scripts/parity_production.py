"""Production-scale parity: our eval forward vs the PyTorch reference at the
real config (N=7000, k=30, emb=1024, converted weights). CPU-only (the
reference is CPU torch); the unit test covers N=96 — this is the full-size
evidence for the <=1e-3 per-point probability budget."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("PALLAS_AXON_POOL_IPS", "")

import numpy as np


def main():
    import jax

    jax.config.update("jax_platforms", "cpu")
    import torch

    sys.path.insert(0, "/root/reference")
    import model as ref_model

    orig = ref_model.get_graph_feature

    def patched(x, k=20, use_cuda=True, **_):
        return orig(x, k=k, use_cuda=use_cuda)

    ref_model.get_graph_feature = patched

    torch.manual_seed(0)
    m = ref_model.DGCNN(num_classes=5, num_features=4, k=30,
                        dropout=0.5, emb_dims=1024, cuda=False)
    m.eval()

    from dgcnn_tpu.compat.torch_ckpt import params_from_torch_state_dict
    from dgcnn_tpu.models.dgcnn import DGCNNConfig, apply_dgcnn

    params, state = params_from_torch_state_dict(m.state_dict())
    cfg = DGCNNConfig(num_classes=5, num_features=4, k=30, emb_dims=1024)

    rng = np.random.default_rng(7)
    # realistic block: 30 m extent, cm-scale jitter, AGL feature
    n = 7000
    xy = rng.integers(0, 3000, (2, n)).astype(np.float32) / 100.0
    z = rng.integers(0, 1500, n).astype(np.float32) / 100.0
    agl = rng.integers(0, 1200, n).astype(np.float32) / 100.0
    x = np.stack([xy[0], xy[1], z, agl]).astype(np.float32)[None]  # (1,4,N)

    t0 = time.time()
    with torch.no_grad():
        want = m(torch.from_numpy(x)).numpy()
    print(f"reference forward: {time.time()-t0:.1f}s")

    t0 = time.time()
    got, _ = apply_dgcnn(params, state, np.transpose(x, (0, 2, 1)), cfg)
    got = np.transpose(np.asarray(got), (0, 2, 1))
    print(f"dgcnn_tpu forward (cpu): {time.time()-t0:.1f}s")

    def softmax(v):
        e = np.exp(v - v.max(axis=1, keepdims=True))
        return e / e.sum(axis=1, keepdims=True)

    drift = np.abs(softmax(got) - softmax(want))
    agree = (got.argmax(1) == want.argmax(1)).mean()
    print(f"N=7000 parity: max prob drift {drift.max():.2e}, "
          f"mean {drift.mean():.2e}, argmax agreement {agree*100:.3f}%")
    assert drift.max() < 1e-3, drift.max()
    print("PASS: production-scale parity inside the 1e-3 budget")


if __name__ == "__main__":
    main()
