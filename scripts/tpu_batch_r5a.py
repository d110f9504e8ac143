"""Round-5 one-process TPU batch (restart-robust; one process = one TPU
claim — see tpu_batch_r3i.py for the retry-across-processes protocol):

  1. entry check
  2. bench (drift-anchored headline — VERDICT r5 item 1 evidence)
  3. exp_guard_and_prec_cost (two-stage recall-guard cost, item 4;
     banded hi_prec delta for the rerank pencil-out, item 1)
  4. exp_bf16_eval_ab (bf16_mm eval A/B, item 3)
  5. exp_exact_floor (exact-mode replay decomposition, item 6)
  6. 30-epoch all-defaults soak (item 10; quality net for this round's
     two-stage guard + warm-marker changes)

    python scripts/tpu_batch_r5a.py > /tmp/tpu_batch_r5a.log 2>&1
"""

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
    t0 = time.time()
    try:
        fn()
        print(f"[{tag} ok in {time.time()-t0:.0f}s]", flush=True)
    except Exception:
        print(f"{tag} FAILED:", flush=True)
        traceback.print_exc()


def _script(name):
    # module-level experiment scripts: execute top-level code in-process
    def thunk():
        runpy.run_path(os.path.join(REPO, "scripts", name),
                       run_name="__main__")

    return thunk


def main():
    if not wait_for_device():
        sys.exit(1)

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
        import importlib

        importlib.import_module("scripts.full_pipeline_tpu").main()

    run_stage("entry check", entry_check)
    run_stage("bench (drift-anchored)", bench_run)
    run_stage("exp_guard_and_prec_cost", _script("exp_guard_and_prec_cost.py"))
    run_stage("exp_bf16_eval_ab", _script("exp_bf16_eval_ab.py"))
    run_stage("exp_exact_floor", _script("exp_exact_floor.py"))
    run_stage("soak: full_pipeline_tpu (30 epochs, all defaults)", soak)
    banner("DONE")


if __name__ == "__main__":
    main()
