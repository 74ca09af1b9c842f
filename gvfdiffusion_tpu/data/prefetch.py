"""Background-thread batch prefetch — host IO / device compute overlap.

The reference overlaps data loading with compute via torch DataLoader
worker processes (reference train_latent.py:157-229 iterates a DataLoader
with num_workers>0). The TPU-native equivalent: a daemon thread pulls
batches from the (numpy) batch iterator, runs the host-side work
(torch.load, stacking, normalization) AND the H2D `device_put` ahead of
consumption, so by the time the train loop asks for batch k+1 its transfer
was already issued while the device executed step k. JAX dispatch is
thread-safe; `device_put` of numpy is async on TPU, so the queue holds
fully-placed device arrays.

A bounded queue (default depth 2 — double buffering) caps host memory:
deeper queues buy nothing once IO is faster than the step, and each slot
pins a full global batch in HBM.
"""

from __future__ import annotations

import queue
import threading
from typing import Callable, Iterator, Optional

_SENTINEL = object()


class Prefetcher:
    """Iterator wrapper: pulls from `it` in a daemon thread, applies
    `place_fn` (e.g. a sharded device_put) in that thread, and hands the
    placed batches out with `next()`. Exceptions in the worker propagate to
    the consumer; `close()` stops the thread promptly."""

    def __init__(
        self,
        it: Iterator,
        place_fn: Optional[Callable] = None,
        depth: int = 2,
    ):
        self._it = it
        self._place = place_fn or (lambda x: x)
        self._q: queue.Queue = queue.Queue(maxsize=max(depth, 1))
        self._stop = threading.Event()
        self._err: Optional[BaseException] = None
        self._thread = threading.Thread(target=self._run, daemon=True)
        self._thread.start()

    def _run(self):
        try:
            for item in self._it:
                placed = self._place(item)
                while not self._stop.is_set():
                    try:
                        self._q.put(placed, timeout=0.1)
                        break
                    except queue.Full:
                        continue
                if self._stop.is_set():
                    return
        except BaseException as e:  # propagated on the consumer side
            self._err = e
        finally:
            while not self._stop.is_set():
                try:
                    self._q.put(_SENTINEL, timeout=0.1)
                    return
                except queue.Full:
                    continue

    def __iter__(self):
        return self

    def __next__(self):
        item = self._q.get()
        if item is _SENTINEL:
            if self._err is not None:
                raise self._err
            raise StopIteration
        return item

    def close(self):
        self._stop.set()
        # drain so a blocked put wakes up
        try:
            while True:
                self._q.get_nowait()
        except queue.Empty:
            pass
        self._thread.join(timeout=5.0)

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()
        return False
