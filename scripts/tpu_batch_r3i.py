"""One-process TPU batch (restart-robust): retry backend init until the
chip claim succeeds, then entry check, scatter-unroll sweep, feature-band
qt sweep, fused-stage tile re-check under feature banding, bench, and the
30-epoch all-new-defaults soak. One process = one TPU claim.

    python scripts/tpu_batch_r3i.py > /tmp/tpu_batch_r3i.log 2>&1
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
    """Single blocking claim attempt. jax caches a FAILED backend init for
    the process lifetime, so retries must happen across processes — drive
    this script with e.g.
        for i in $(seq 30); do python scripts/tpu_batch_r3i.py && break
            sleep 120; done
    (exit 1 = claim failed; any stage failure still exits 0)."""
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


def main():
    if not wait_for_device():
        sys.exit(1)

    def entry_check():
        import __graft_entry__ as g

        fn, args = g.entry()
        out = fn(*args)
        out.block_until_ready()
        print("entry forward:", out.shape, out.dtype, flush=True)

    run_stage("entry check", entry_check)

    def _mod(name):
        # thunk: the import itself must happen INSIDE run_stage's
        # try/except so an import-time crash doesn't abort the batch
        def thunk():
            import importlib

            importlib.import_module(f"scripts.{name}").main()

        return thunk

    def bench_run():
        sys.argv = ["bench.py"]
        import bench

        bench.main()

    # round-critical artifacts FIRST (the chip may not stay up): bench
    # evidence + the 30-epoch all-new-defaults soak, then tuning sweeps
    run_stage("bench", bench_run)
    run_stage("soak: full_pipeline_tpu (30 epochs, all-new defaults)",
              _mod("full_pipeline_tpu"))
    run_stage("exp_scatter_unroll", _mod("exp_scatter_unroll"))
    run_stage("exp_fb_qt", _mod("exp_fb_qt"))
    run_stage("exp_stage_tiles_fb", _mod("exp_stage_tiles_fb"))
    banner("DONE")


if __name__ == "__main__":
    main()
