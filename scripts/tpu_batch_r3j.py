"""One-process TPU batch (round-3 continued): convergence soak with the
stage-3 in-kernel-cotangent backward as default (the prior all-defaults
soak predates it; its grads differ from stock at ~1e-3 f32 sum-order, so
fresh 30-epoch evidence is needed), then the train-step breakdown at the
new ~63.5 ms baseline. One process = one TPU claim; retry across
processes on claim failure (exit 1):

    for i in $(seq 30); do python scripts/tpu_batch_r3j.py && break; \
        sleep 120; done > /tmp/tpu_batch_r3j.log 2>&1
"""

import sys
import time
import traceback

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from dgcnn_tpu.utils.compilation_cache import (
    enable_persistent_compilation_cache,
)

enable_persistent_compilation_cache()


def banner(tag):
    print(f"\n===== {tag} @ {time.strftime('%H:%M:%S')} =====", flush=True)


def wait_for_device():
    import jax

    t0 = time.time()
    try:
        d = jax.devices()[0]
        print(f"device up: {d.device_kind} after {time.time()-t0:.0f}s",
              flush=True)
        return True
    except RuntimeError as e:
        print(f"device claim failed after {time.time()-t0:.0f}s: "
              f"{str(e)[:160]}", flush=True)
        return False


def run_stage(tag, fn):
    banner(tag)
    try:
        fn()
    except Exception:
        print(f"{tag} FAILED:", flush=True)
        traceback.print_exc()


def _mod(name):
    def thunk():
        import importlib

        importlib.import_module(f"scripts.{name}").main()

    return thunk


def main():
    if not wait_for_device():
        sys.exit(1)
    run_stage("soak: full_pipeline_tpu (30 epochs, stage-3 kernel bwd)",
              _mod("full_pipeline_tpu"))
    run_stage("exp_train_breakdown_r3c", _mod("exp_train_breakdown_r3c"))
    banner("DONE")


if __name__ == "__main__":
    main()
