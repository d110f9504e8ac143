"""Convert reference PyTorch checkpoints (.t7) into dgcnn_tpu pytrees.

The reference persists ``{'epoch', 'mBPCA', 'model_state_dict',
'optimizer_state_dict', 'scheduler_state_dict'}`` via ``torch.save``
(/root/reference/train.py:305-312). We map ``model_state_dict`` onto our
functional parameter/state pytrees so reference-trained weights run on TPU
unchanged (optimizer state is torch-specific and not carried over).

Layout notes: torch ConvNd weights are (C_out, C_in, 1[, 1]); ours are
channels-last (C_in, C_out) matrices. BatchNorm tensors map one-to-one.
"""

from __future__ import annotations

from typing import Any, Mapping

import numpy as np
import jax.numpy as jnp

_CONVS = [f"conv{i}" for i in range(1, 10)]
_BNS = [f"bn{i}" for i in range(1, 9)]


def params_from_torch_state_dict(
    sd: Mapping[str, Any],
) -> tuple[dict, dict]:
    """Build (params, bn_state) pytrees from a reference model state dict.

    Accepts either torch tensors or numpy arrays as values; keys follow the
    reference module names (convN.0.weight for the conv inside each
    Sequential, bnN.* for the shared BatchNorm modules, conv9.weight for the
    bare final conv — /root/reference/model.py:107-141).
    """

    def arr(key: str) -> np.ndarray:
        v = sd[key]
        if hasattr(v, "detach"):  # torch tensor
            v = v.detach().cpu().numpy()
        return np.asarray(v, np.float32)

    params: dict = {}
    state: dict = {}
    for name in _CONVS:
        key = f"{name}.0.weight" if f"{name}.0.weight" in sd else f"{name}.weight"
        w = arr(key)  # (C_out, C_in, 1[, 1])
        w = w.reshape(w.shape[0], w.shape[1])  # (C_out, C_in)
        params[name] = {"w": jnp.asarray(w.T)}  # (C_in, C_out)
    for name in _BNS:
        params[name] = {
            "gamma": jnp.asarray(arr(f"{name}.weight")),
            "beta": jnp.asarray(arr(f"{name}.bias")),
        }
        state[name] = {
            "mean": jnp.asarray(arr(f"{name}.running_mean")),
            "var": jnp.asarray(arr(f"{name}.running_var")),
        }
    return params, state


def torch_state_dict_from_params(params: dict, state: dict) -> dict:
    """Inverse of :func:`params_from_torch_state_dict`: build a reference-
    compatible ``model_state_dict`` (numpy values; call ``torch.save`` after
    mapping through ``torch.from_numpy`` if tensors are required). Lets
    models trained here run in the reference PyTorch stack."""
    sd: dict = {}
    for name in _CONVS:
        w = np.asarray(params[name]["w"]).T  # (C_out, C_in)
        if name in ("conv6", "conv7", "conv8", "conv9"):
            w = w[:, :, None]                # Conv1d kernel
        else:
            w = w[:, :, None, None]          # Conv2d kernel
        key = f"{name}.0.weight" if name != "conv9" else "conv9.weight"
        sd[key] = w
    for name in _BNS:
        sd[f"{name}.weight"] = np.asarray(params[name]["gamma"])
        sd[f"{name}.bias"] = np.asarray(params[name]["beta"])
        sd[f"{name}.running_mean"] = np.asarray(state[name]["mean"])
        sd[f"{name}.running_var"] = np.asarray(state[name]["var"])
        sd[f"{name}.num_batches_tracked"] = np.asarray(0, np.int64)
    return sd


def load_torch_checkpoint(path: str) -> dict:
    """Load a reference .t7 checkpoint file and convert it.

    Returns ``{'params', 'bn_state', 'epoch', 'best_balanced_accuracy'}``.
    Requires torch to unpickle (CPU map_location, mirroring
    /root/reference/test.py:93-96).
    """
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    params, state = params_from_torch_state_dict(ckpt["model_state_dict"])
    return {
        "params": params,
        "bn_state": state,
        "epoch": int(ckpt.get("epoch", -1)),
        "best_balanced_accuracy": float(ckpt.get("mBPCA", 0.0)),
    }
