"""Production serving: a persistent classification service over LAS tiles.

The reference has no serving story — its production mode is "run test.py
by hand per tile" (/root/reference/test.py:223-332). Deployed LiDAR
pipelines are batch-shaped: tiles arrive in a landing directory and must
come out classified, with per-tile provenance and service health that a
scheduler can scrape. This module provides exactly that, framework-native:

* :class:`PredictService` — one process-lifetime object: the model is
  restored once, every jitted program stays warm after the first tile
  (first call pays ~30 s of TPU compile, subsequent tiles run at the
  0.7 s/400k-pt warm rate), and counters accumulate.
* :func:`serve_directory` — poll a landing directory, classify each new
  tile to an output directory (atomic rename), write a JSON sidecar with
  timing/point counts per tile, isolate failures (error sidecar in
  ``failed/``; the service never dies on a bad tile), and maintain a
  ``status.json`` heartbeat. Tiles are PIPELINED: the next tile's load
  stage (LAS decode + noise filter, model-independent) runs on a worker
  thread while the current tile owns the device.
* :func:`start_status_server` — optional stdlib HTTP endpoint serving the
  live status JSON for probes.

CLI: ``python -m dgcnn_tpu.serve --model_root ... --in_dir ... --out_dir ...``
"""

from __future__ import annotations

import json
import os
import threading
import time
from typing import Any

from dgcnn_tpu.utils.logging import IOStream

_INPUT_EXTS = (".las", ".h5", ".hdf5")


class PredictService:
    """Persistent whole-cloud classifier (see :func:`eval.predict.predict`
    for the single-shot equivalent; all keyword arguments are forwarded).

    The underlying jit caches are process-global, so repeated calls with
    the same config reuse compiled programs; the checkpoint is read once.
    """

    def __init__(self, k: int, io: IOStream | None = None,
                 **predict_kwargs: Any):
        import sys

        self.k = k
        # default logger: file side to /dev/null, stream side to STDERR —
        # IOStream(stream=None) would print() to stdout, corrupting any
        # embedding app with a machine-readable stdout (e.g. bench.py's
        # one-JSON-line contract)
        self.io = io or IOStream(os.devnull, stream=sys.stderr)
        self.kwargs = predict_kwargs
        self.started = time.time()
        self.processed = 0
        self.failed = 0
        self.total_points = 0
        self.last: dict[str, Any] | None = None

    def load_tile(self, in_path: str):
        """Model-independent load stage for ``in_path`` — safe to run on a
        worker thread while another tile classifies; pass the result to
        :meth:`classify_file` as ``preloaded``. Uses the fused native tile
        load (decode + noise + DTM + AGL + window indexing in one ctypes
        call, prepare/tile_load.py) when it can serve this file/config,
        else the separate-stage predict_load chain."""
        from dgcnn_tpu.eval.predict import predict_load
        from dgcnn_tpu.prepare.tile_load import load_tile_las

        tl = load_tile_las(
            in_path,
            self.kwargs.get("features"),
            self.kwargs.get("features_output"),
            dtm_kwargs=self.kwargs.get("dtm_kwargs"),
            block_size=self.kwargs.get("block_size", 30.0),
        )
        if tl is not None:
            return tl
        return predict_load(
            in_path,
            features=self.kwargs.get("features"),
            features_output=self.kwargs.get("features_output"),
        )

    def classify_file(self, in_path: str, out_path: str,
                      preloaded=None) -> dict[str, Any]:
        """Classify one tile; returns the per-tile stats dict (also stored
        as ``self.last``). Output is written atomically (tmp + rename)."""
        from dgcnn_tpu.eval.predict import predict

        t0 = time.time()
        tmp = out_path + ".tmp"
        try:
            data, preds = predict(self.k, self.io, in_path, tmp,
                                  preloaded=preloaded, **self.kwargs)
        except Exception:
            # never leak a partial .tmp into the output directory
            if os.path.exists(tmp):
                os.unlink(tmp)
            raise
        # predict() writes no LAS when the tile has no classifiable blocks
        produced = os.path.exists(tmp)
        if produced:
            os.replace(tmp, out_path)
        dt = time.time() - t0
        # "points" = classified output points (what the user receives);
        # block_points counts the padded/duplicated per-block rows the
        # device actually processed (>= points)
        n_pts = int(len(data))
        stats = {
            "input": os.path.abspath(in_path),
            "output": os.path.abspath(out_path) if produced else None,
            "points": n_pts,
            "block_points": int(len(preds)),
            "seconds": round(dt, 3),
            "points_per_sec": round(n_pts / dt, 1) if dt > 0 else None,
            "finished": time.time(),
        }
        self.processed += 1
        self.total_points += stats["points"]
        self.last = stats
        return stats

    def status(self) -> dict[str, Any]:
        return {
            "uptime_s": round(time.time() - self.started, 1),
            "processed": self.processed,
            "failed": self.failed,
            "total_points": self.total_points,
            "last": self.last,
        }


def _atomic_json(path: str, obj: Any) -> None:
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(obj, f, indent=1)
    os.replace(tmp, path)


def serve_directory(
    service: PredictService,
    in_dir: str,
    out_dir: str,
    *,
    poll_s: float = 2.0,
    once: bool = False,
    failed_dir: str | None = None,
    max_tiles: int | None = None,
    settle_s: float = 1.0,
) -> int:
    """Watch ``in_dir`` for point-cloud tiles and classify them into
    ``out_dir``.

    A tile ``name.las`` produces ``out_dir/name.las`` (classified) and
    ``out_dir/name.las.json`` (stats sidecar — keyed on the FULL input
    filename so ``status.las`` cannot collide with the ``status.json``
    heartbeat and ``a.las``/``a.h5`` keep distinct sidecars; non-.las
    inputs classify to ``name.las`` with the extension kept, e.g.
    ``a.h5.las``). A tile is skipped when its
    sidecar already exists (idempotent restarts) and is not picked up
    until its mtime is at least ``settle_s`` old (half-written uploads).
    Failures write ``failed_dir/name.error.json`` and never stop the
    service. ``once=True`` drains the current backlog and returns;
    ``max_tiles`` bounds total ATTEMPTED tiles this run (successes +
    failures — a quota of successes alone could never be met on a backlog
    full of bad tiles and the watcher would poll forever). Returns the
    number of tiles successfully processed.
    """
    failed_dir = failed_dir or os.path.join(out_dir, "failed")
    os.makedirs(out_dir, exist_ok=True)
    os.makedirs(failed_dir, exist_ok=True)
    done = 0
    attempted = 0
    while True:
        names = sorted(
            f for f in os.listdir(in_dir)
            if f.lower().endswith(_INPUT_EXTS)
        )
        ready = []
        for name in names:
            sidecar = os.path.join(out_dir, name + ".json")
            err_path = os.path.join(failed_dir, name + ".error.json")
            if os.path.exists(sidecar) or os.path.exists(err_path):
                continue
            src = os.path.join(in_dir, name)
            try:
                mtime = os.path.getmtime(src)
            except OSError:
                continue  # deleted/renamed between listdir and here
            if time.time() - mtime < settle_s:
                continue  # possibly still uploading — next poll
            ready.append(name)
        if max_tiles is not None:
            ready = ready[: max_tiles - attempted]

        # One-slot tile pipeline: while tile i is classifying (device +
        # DTM/AGL busy), a worker thread runs the model-independent load
        # stage (decode + noise filter) of tile i+1. A prefetch error is
        # DISCARDED — classify_file then reloads on the main thread so
        # the failure is attributed to its tile via the normal error
        # sidecar, not swallowed on a worker.
        def _prefetch(nm: str, box: dict):
            try:
                box["data"] = service.load_tile(os.path.join(in_dir, nm))
            except BaseException:  # noqa: BLE001 — see note above
                pass

        pending: "tuple[threading.Thread, dict] | None" = None
        for i, name in enumerate(ready):
            sidecar = os.path.join(out_dir, name + ".json")
            err_path = os.path.join(failed_dir, name + ".error.json")
            src = os.path.join(in_dir, name)
            # kick the NEXT tile's load before blocking on this one
            nxt = None
            if i + 1 < len(ready):
                box: dict = {}
                th = threading.Thread(
                    target=_prefetch, args=(ready[i + 1], box), daemon=True,
                )
                th.start()
                nxt = (th, box)
            preloaded = None
            if pending is not None:
                pending[0].join()
                preloaded = pending[1].get("data")
            pending = nxt
            out_name = (name if name.lower().endswith(".las")
                        else name + ".las")
            out_las = os.path.join(out_dir, out_name)
            attempted += 1
            try:
                stats = service.classify_file(src, out_las,
                                              preloaded=preloaded)
                _atomic_json(sidecar, stats)
                # the return value counts SUCCESSES; the max_tiles quota
                # counts attempts (failures are isolated via the error
                # sidecar and never retried, so counting only successes
                # would hang a bounded run on a failure-laden backlog)
                done += 1
            except Exception as e:  # noqa: BLE001 — service must survive
                service.failed += 1
                _atomic_json(err_path, {
                    "input": os.path.abspath(src),
                    "error": f"{type(e).__name__}: {e}",
                    "time": time.time(),
                })
                service.io.cprint(f"FAILED {name}: {type(e).__name__}: {e}")
            _atomic_json(os.path.join(out_dir, "status.json"),
                         service.status())
            if max_tiles is not None and attempted >= max_tiles:
                return done
        _atomic_json(os.path.join(out_dir, "status.json"), service.status())
        if once:
            return done
        time.sleep(poll_s)


def start_status_server(service: PredictService, port: int) -> threading.Thread:
    """Serve ``service.status()`` as JSON on ``localhost:port`` (stdlib
    http.server on a daemon thread — liveness/health probes only)."""
    from http.server import BaseHTTPRequestHandler, HTTPServer

    class Handler(BaseHTTPRequestHandler):
        def do_GET(self):  # noqa: N802 (http.server API)
            body = json.dumps(service.status()).encode()
            self.send_response(200)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def log_message(self, *a):  # quiet
            pass

    server = HTTPServer(("127.0.0.1", port), Handler)
    thread = threading.Thread(target=server.serve_forever, daemon=True)
    thread.server = server  # type: ignore[attr-defined]
    thread.start()
    return thread
