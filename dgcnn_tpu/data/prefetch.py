"""Host→device prefetching.

The reference overlaps data loading with training via DataLoader worker
processes (/root/reference/train.py:79-97). The TPU-native equivalent: a
background thread assembles the next batches (numpy) and issues
``jax.device_put`` with the target sharding ahead of consumption, so the
host pipeline and device compute overlap (double buffering).
"""

from __future__ import annotations

import queue
import threading
from typing import Callable, Iterable, Iterator


def prefetch_to_device(
    it: Iterable,
    size: int = 2,
    transfer: Callable | None = None,
) -> Iterator:
    """Wrap a host batch iterator with background transfer.

    Args:
        it: iterable of host batches.
        transfer: per-batch function (e.g. ``lambda b: jax.device_put(b,
            sharding)``); identity when None.
        size: prefetch depth (2 = classic double buffering).
    """
    transfer = transfer or (lambda x: x)
    q: queue.Queue = queue.Queue(maxsize=size)
    sentinel = object()
    err: list[BaseException] = []

    def producer():
        try:
            for item in it:
                q.put(transfer(item))
        except BaseException as e:  # surfaced in the consumer
            err.append(e)
        finally:
            q.put(sentinel)

    t = threading.Thread(target=producer, daemon=True)
    t.start()
    while True:
        item = q.get()
        if item is sentinel:
            if err:
                raise err[0]
            return
        yield item
