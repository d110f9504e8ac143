"""HDF5 point-cloud reader.

Mirrors /root/reference/prepare_data/process_data.py:17-46: datasets live
under ``LAS/Position`` (N,3), ``LAS/Classification`` (N,), with optional
``AGL``, ``LAS/Color``, ``LAS/Intensity``, ``LAS/ReturnNumber``,
``LAS/NumberOfReturns``.
"""

from __future__ import annotations

import numpy as np


def read_h5_pointcloud(path: str) -> dict[str, np.ndarray]:
    """Read the reference HDF5 layout into a dict of numpy arrays.

    Returns at least {'position' (N,3), 'classification' (N,)}; optional
    keys: 'agl', 'color', 'intensity', 'return_number', 'number_of_returns'.
    """
    import h5py

    out: dict[str, np.ndarray] = {}
    with h5py.File(path, "r") as f:
        out["position"] = np.asarray(f["LAS/Position"], np.float64)
        out["classification"] = np.asarray(f["LAS/Classification"]).reshape(-1)
        if "AGL" in f:
            out["agl"] = np.asarray(f["AGL"], np.float64).reshape(-1)
        opt = {
            "color": "LAS/Color",
            "intensity": "LAS/Intensity",
            "return_number": "LAS/ReturnNumber",
            "number_of_returns": "LAS/NumberOfReturns",
        }
        for name, key in opt.items():
            if key in f:
                out[name] = np.asarray(f[key])
    return out
