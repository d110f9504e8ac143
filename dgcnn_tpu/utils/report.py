"""Environment report for production debugging (``collect_env`` style).

``python -m dgcnn_tpu.utils.report`` prints one JSON object describing
everything that determines this framework's behaviour on the current
host: library versions, the JAX backend and device kind, which native
libdtmgen entry points are available (fused LAS load, noise mask, DTM,
AGL), the persistent-compilation-cache and kNN-autotune cache state, and
the DGCNNConfig defaults that select kernels (bands, fusion, dropout
RNG). Attach it to bug reports / serve incident tickets.

No reference analogue (the reference has no deployment tooling); part of
the serving layer alongside dgcnn_tpu/serve/.
"""

from __future__ import annotations

import json
import os
import sys


def collect_report(probe_device: bool = True) -> dict:
    """Build the report dict. ``probe_device=False`` skips jax.devices()
    (which on remote-tunnelled hosts may block on a chip claim)."""
    import jax

    import dgcnn_tpu

    rep: dict = {
        "python": sys.version.split()[0],
        "jax": jax.__version__,
        "dgcnn_tpu": getattr(dgcnn_tpu, "__version__", "unversioned"),
    }
    try:
        import numpy

        rep["numpy"] = numpy.__version__
    except Exception:  # pragma: no cover
        pass

    if probe_device:
        try:
            devs = jax.devices()
            rep["backend"] = jax.default_backend()
            rep["devices"] = len(devs)
            rep["device_kind"] = devs[0].device_kind
        except Exception as e:
            rep["backend_error"] = f"{type(e).__name__}: {str(e)[:200]}"

    # native component surface
    native: dict = {"available": False}
    try:
        from dgcnn_tpu.prepare.dtm import _native_lib

        lib = _native_lib()
        if lib is not None:
            native["available"] = True
            native["entry_points"] = sorted(
                name for name in (
                    "dtmgen_compute", "dtmgen_noise_mask",
                    "dtmgen_agl_knn", "dtmgen_las_decode",
                    "dtmgen_las_load",
                ) if hasattr(lib, name)
            )
    except Exception as e:  # pragma: no cover
        native["error"] = f"{type(e).__name__}: {str(e)[:120]}"
    rep["native_dtmgen"] = native

    # persistent compilation cache + warm markers
    env = os.environ.get("DGCNN_JAX_CACHE_DIR")
    cache_dir = (env if env is not None and env != "" else
                 None if env == "" else
                 os.path.join(os.path.expanduser("~"), ".cache",
                              "dgcnn_tpu", "jax"))
    if env == "":
        rep["compilation_cache"] = {"enabled": False}
    else:
        entries = 0
        if cache_dir and os.path.isdir(cache_dir):
            entries = sum(1 for _ in os.scandir(cache_dir))
        rep["compilation_cache"] = {
            "enabled": True, "dir": cache_dir, "entries": entries,
        }

    # kNN autotune cache (per device_kind query-tile sweeps)
    at_dir = (os.environ.get("DGCNN_AUTOTUNE_DIR")
              or os.path.join(os.path.expanduser("~"), ".cache",
                              "dgcnn_tpu"))
    tunes = []
    if os.path.isdir(at_dir):
        tunes = sorted(f.name for f in os.scandir(at_dir)
                       if f.name.endswith(".json"))
    rep["knn_autotune"] = {
        "dir": at_dir, "entries": tunes,
        "disabled": os.environ.get("DGCNN_KNN_AUTOTUNE") == "0",
    }

    # kernel-selecting config defaults
    from dgcnn_tpu.models.dgcnn import DGCNNConfig

    cfg = DGCNNConfig()
    rep["config_defaults"] = {
        f: getattr(cfg, f)
        for f in ("knn_impl", "knn_band", "knn_band_feature",
                  "knn_share_stage3", "knn_cap",
                  "ring_band_shards", "ring_band_feature_shards",
                  "fuse_epilogue", "bn_stats", "stage_tail_fused",
                  "knn_train_unroll", "dropout_rng_impl")
        if hasattr(cfg, f)
    }

    # env knobs that override kernel behaviour, when set
    knobs = {k: v for k, v in os.environ.items()
             if k.startswith("DGCNN_")}
    if knobs:
        rep["env_overrides"] = knobs
    return rep


def main(argv: list[str] | None = None) -> int:
    args = argv if argv is not None else sys.argv[1:]
    probe = "--no-device" not in args
    print(json.dumps(collect_report(probe_device=probe), indent=1,
                     default=str))
    return 0


if __name__ == "__main__":
    sys.exit(main())
