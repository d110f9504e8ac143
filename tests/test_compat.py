"""torch-checkpoint interop tests: .t7 round trip through the converter and
the eval restore path (skipped without torch)."""

import os

import numpy as np
import pytest

from conftest import has_torch

pytestmark = pytest.mark.skipif(not has_torch(), reason="torch unavailable")


def _fake_torch_model_state():
    """Build a reference-shaped state dict with plain torch tensors."""
    import torch

    f, emb, c = 4, 32, 3
    plan = {
        "conv1": (64, 2 * f), "conv2": (64, 64), "conv3": (64, 128),
        "conv4": (64, 64), "conv5": (64, 128), "conv6": (emb, 192),
        "conv7": (512, emb + 192), "conv8": (256, 512), "conv9": (c, 256),
    }
    sd = {}
    g = torch.Generator().manual_seed(0)
    for name, (co, ci) in plan.items():
        kernel = (co, ci, 1) if name in ("conv6", "conv7", "conv8", "conv9") \
            else (co, ci, 1, 1)
        sd[f"{name}.0.weight" if name != "conv9" else "conv9.weight"] = (
            torch.randn(kernel, generator=g)
        )
    for i, co in enumerate([64, 64, 64, 64, 64, emb, 512, 256], start=1):
        sd[f"bn{i}.weight"] = torch.randn(co, generator=g)
        sd[f"bn{i}.bias"] = torch.randn(co, generator=g)
        sd[f"bn{i}.running_mean"] = torch.randn(co, generator=g)
        sd[f"bn{i}.running_var"] = torch.rand(co, generator=g) + 0.5
        sd[f"bn{i}.num_batches_tracked"] = torch.tensor(7)
    return sd, dict(f=f, emb=emb, c=c)


def test_t7_load_and_shapes(tmp_path):
    import torch

    sd, dims = _fake_torch_model_state()
    ckpt = {
        "epoch": 12,
        "mBPCA": 0.91,
        "model_state_dict": sd,
        "optimizer_state_dict": {},
        "scheduler_state_dict": {},
    }
    path = str(tmp_path / "model.t7")
    torch.save(ckpt, path)

    from dgcnn_tpu.compat.torch_ckpt import load_torch_checkpoint

    out = load_torch_checkpoint(path)
    assert out["epoch"] == 12 and out["best_balanced_accuracy"] == 0.91
    assert out["params"]["conv1"]["w"].shape == (2 * dims["f"], 64)
    assert out["params"]["conv7"]["w"].shape == (dims["emb"] + 192, 512)
    np.testing.assert_allclose(
        np.asarray(out["params"]["conv3"]["w"]),
        sd["conv3.0.weight"].numpy().reshape(64, 128).T,
    )
    np.testing.assert_allclose(
        np.asarray(out["bn_state"]["bn2"]["var"]),
        sd["bn2.running_var"].numpy(),
    )


def test_round_trip_to_torch_and_back(tmp_path):
    """params -> torch state dict -> params is the identity."""
    import jax

    from dgcnn_tpu.compat.torch_ckpt import (
        params_from_torch_state_dict,
        torch_state_dict_from_params,
    )
    from dgcnn_tpu.models.dgcnn import DGCNNConfig, init_dgcnn

    cfg = DGCNNConfig(num_classes=4, num_features=3, k=5, emb_dims=64)
    params, state = init_dgcnn(jax.random.key(3), cfg)
    sd = torch_state_dict_from_params(params, state)
    back_p, back_s = params_from_torch_state_dict(sd)
    for a, b in zip(jax.tree_util.tree_leaves(params),
                    jax.tree_util.tree_leaves(back_p)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    for a, b in zip(jax.tree_util.tree_leaves(state),
                    jax.tree_util.tree_leaves(back_s)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_exported_state_dict_loads_into_reference(tmp_path):
    """Our exported weights must load into the actual reference model."""
    import sys

    from conftest import REFERENCE_DIR, has_reference

    if not has_reference():
        pytest.skip("reference unavailable")
    import torch

    import jax

    from dgcnn_tpu.compat.torch_ckpt import torch_state_dict_from_params
    from dgcnn_tpu.models.dgcnn import DGCNNConfig, init_dgcnn

    sys.path.insert(0, REFERENCE_DIR)
    import model as ref_model

    cfg = DGCNNConfig(num_classes=5, num_features=4, k=8, emb_dims=1024)
    params, state = init_dgcnn(jax.random.key(1), cfg)
    sd = {k: torch.from_numpy(np.ascontiguousarray(v))
          for k, v in torch_state_dict_from_params(params, state).items()}
    m = ref_model.DGCNN(num_classes=5, num_features=4, k=8, cuda=False)
    missing, unexpected = m.load_state_dict(sd, strict=False)
    assert not unexpected, unexpected
    # the Sequential re-registers the same conv/bn modules under extra
    # names; everything we export must be consumed
    assert all(".1." in k or k.startswith("conv") for k in missing), missing


def test_eval_restore_picks_up_t7(tmp_path):
    import torch

    from dgcnn_tpu.eval.test import _restore
    from dgcnn_tpu.models.dgcnn import DGCNNConfig, apply_dgcnn
    from dgcnn_tpu.utils.logging import IOStream

    sd, dims = _fake_torch_model_state()
    torch.save({"model_state_dict": sd, "epoch": 1, "mBPCA": 0.5},
               str(tmp_path / "m.t7"))
    cfg = DGCNNConfig(num_classes=dims["c"], num_features=dims["f"], k=5,
                      emb_dims=dims["emb"], knn_query_chunk=None)
    io = IOStream(str(tmp_path / "log.txt"))
    params, bn_state = _restore(cfg, str(tmp_path), "m", io)
    x = np.random.default_rng(0).random((1, 40, 4)).astype(np.float32)
    logits, _ = apply_dgcnn(params, bn_state, x, cfg)
    assert logits.shape == (1, 40, dims["c"])
    assert np.all(np.isfinite(np.asarray(logits)))
