"""Host -> device input pipeline: background staging + double buffering.

The reference leans on torch DataLoader worker processes (train.py:266) to
hide input latency. Here a daemon thread runs the (possibly C++-backed)
batch iterator and `jax.device_put`s each batch ahead of time, so the
accelerator's next batch is already on HBM while the current step runs —
classic double buffering (queue depth 2 by default).
"""

from __future__ import annotations

import queue
import threading
from typing import Any, Callable, Iterable, Iterator, Optional

import jax


_SENTINEL = object()


def device_prefetch(
    iterator: Iterable,
    size: int = 2,
    transfer: Optional[Callable[[Any], Any]] = None,
) -> Iterator:
    """Wrap a host batch iterator with background device transfer.

    transfer: batch -> device batch (default jax.device_put; pass
    core.mesh.shard_batch-partial for sharded layouts).
    """
    transfer = transfer or jax.device_put
    q: "queue.Queue" = queue.Queue(maxsize=size)
    stop = threading.Event()

    def worker():
        try:
            for item in iterator:
                if stop.is_set():
                    return
                q.put(transfer(item))
        finally:
            q.put(_SENTINEL)

    t = threading.Thread(target=worker, daemon=True)
    t.start()

    try:
        while True:
            item = q.get()
            if item is _SENTINEL:
                return
            yield item
    finally:
        stop.set()
        # drain so the worker can exit if blocked on put
        try:
            while True:
                q.get_nowait()
        except queue.Empty:
            pass
