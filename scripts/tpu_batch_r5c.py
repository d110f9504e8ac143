"""Round-5 third TPU batch (one process = one TPU claim):

  1. entry check
  2. bench — capped/share3 arms + train step now dispatch at the
     production AMORTIZED recall-guard cadence (guard_every=8 default;
     the round-5 close of VERDICT r4 item 4)
  3. exp_guard_amortized_ab — full-forward A/B: guard-every-call vs
     amortized cadence vs guard-off floor, interleaved rounds
  4. soak: full_pipeline_tpu (30 epochs, ALL defaults incl. the
     amortized guard in the train loop + guarded eval/predict) —
     quality net: bacc >=0.993, mIoU >=0.985, agreement >=0.9999
     (VERDICT r4 item 10 cadence)

    python scripts/tpu_batch_r5c.py > /tmp/tpu_batch_r5c.log 2>&1
"""

import importlib
import os
import runpy
import sys
import time
import traceback

REPO = __file__.rsplit("/", 2)[0]
sys.path.insert(0, REPO)

from dgcnn_tpu.utils.compilation_cache import (
    enable_persistent_compilation_cache,
)

enable_persistent_compilation_cache()


def banner(tag):
    print(f"\n===== {tag} @ {time.strftime('%H:%M:%S')} =====", flush=True)


def run_stage(tag, fn):
    banner(tag)
    t0 = time.time()
    try:
        fn()
        print(f"[{tag} ok in {time.time()-t0:.0f}s]", flush=True)
    except Exception:
        print(f"{tag} FAILED:", flush=True)
        traceback.print_exc()


def _script(name):
    def thunk():
        runpy.run_path(os.path.join(REPO, "scripts", name),
                       run_name="__main__")

    return thunk


def main():
    import jax

    t0 = time.time()
    d = jax.devices()[0]
    print(f"device up: {d.device_kind} after {time.time()-t0:.0f}s",
          flush=True)

    def entry_check():
        import __graft_entry__ as g

        fn, args = g.entry()
        out = fn(*args)
        out.block_until_ready()
        print("entry forward:", out.shape, out.dtype, flush=True)

    def bench_run():
        sys.argv = ["bench.py"]
        import bench

        bench.main()

    def soak():
        sys.argv = ["full_pipeline_tpu.py"]
        importlib.import_module("scripts.full_pipeline_tpu").main()

    run_stage("entry check", entry_check)
    run_stage("bench (amortized guard cadence)", bench_run)
    run_stage("exp_guard_amortized_ab", _script("exp_guard_amortized_ab.py"))
    run_stage("soak: full_pipeline_tpu (30 epochs, all defaults)", soak)
    banner("DONE")


if __name__ == "__main__":
    main()
