"""Logging utilities.

``IOStream`` keeps the reference's tee'd file+stdout line logger API
(/root/reference/util.py:37-58). ``ScalarWriter`` wraps tensorboardX when
available and degrades to a JSONL file otherwise (the reference used five
misconfigured SummaryWriters, train.py:146-150; here one writer with tags).
"""

from __future__ import annotations

import json
import os
import time


class IOStream:
    """Tee'd line logger: prints and appends to a log file.

    ``stream`` selects the console side of the tee (default stdout, matching
    /root/reference/util.py:37-58); pass ``sys.stderr`` where stdout is a
    machine-readable channel (bench.py's one-JSON-line contract)."""

    def __init__(self, path: str, stream=None):
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        self.f = open(path, "a")
        self.stream = stream

    def cprint(self, text: str) -> None:
        print(text, file=self.stream, flush=True)
        self.f.write(text + "\n")
        self.f.flush()

    def close(self) -> None:
        self.f.close()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()


class ScalarWriter:
    """Scalar metric writer: tensorboardX if importable, else JSONL."""

    def __init__(self, log_dir: str):
        os.makedirs(log_dir, exist_ok=True)
        self._tb = None
        try:
            from tensorboardX import SummaryWriter

            self._tb = SummaryWriter(log_dir)
        except Exception:
            pass
        self._jsonl = open(os.path.join(log_dir, "scalars.jsonl"), "a")

    def add_scalar(self, tag: str, value: float, step: int) -> None:
        if self._tb is not None:
            self._tb.add_scalar(tag, value, step)
        self._jsonl.write(
            json.dumps({"t": time.time(), "tag": tag, "value": float(value),
                        "step": int(step)}) + "\n"
        )
        self._jsonl.flush()

    def close(self) -> None:
        if self._tb is not None:
            self._tb.close()
        self._jsonl.close()


class NullWriter:
    """ScalarWriter-shaped no-op: non-zero processes of a multi-host run
    log nothing (process 0 writes the one true scalar stream)."""

    def add_scalar(self, tag: str, value: float, step: int) -> None:
        pass

    def close(self) -> None:
        pass
