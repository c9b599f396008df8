"""Host-side batch prefetching.

The jitted GAN step runs ~14 ms on one chip; assembling a (32, 16000) crop
batch in Python costs a comparable amount, so without overlap the input
pipeline would halve throughput. PrefetchIterator runs the batcher in a
daemon thread feeding a bounded queue — batch b+1..b+depth are built while
batch b trains. Numpy arrays cross the queue; jax transfers them on use
(device transfer overlaps via jax's async dispatch).
"""

from __future__ import annotations

import queue
import threading
from typing import Iterable, Iterator


class PrefetchIterator:
    def __init__(self, source: Iterable, depth: int = 2):
        self._it = iter(source)
        self._q: queue.Queue = queue.Queue(maxsize=depth)
        self._done = object()
        self._err: Exception | None = None
        self._thread = threading.Thread(target=self._fill, daemon=True)
        self._thread.start()

    def _fill(self):
        try:
            for item in self._it:
                self._q.put(item)
        except Exception as e:  # surfaced on next()
            self._err = e
        finally:
            self._q.put(self._done)

    def __iter__(self) -> Iterator:
        return self

    def __next__(self):
        item = self._q.get()
        if item is self._done:
            if self._err is not None:
                raise self._err
            raise StopIteration
        return item


class BatcherPool:
    """N producer threads, each draining its own seeded batcher into one
    queue. numpy slice copies release the GIL, so producers scale until
    memory bandwidth; batch order is the queue interleaving (per-thread
    streams stay seeded/reproducible, the interleave is not — training
    batches are i.i.d. crops, so order carries no semantics).
    """

    def __init__(self, make_batcher, *, n_threads: int = 3, depth: int = 8,
                 seed: int = 0):
        self._q: queue.Queue = queue.Queue(maxsize=depth)
        self._threads = []
        for t in range(n_threads):
            batcher = make_batcher(seed + 7919 * t)
            th = threading.Thread(
                target=self._fill, args=(batcher,), daemon=True
            )
            th.start()
            self._threads.append(th)

    def _fill(self, batcher):
        for item in batcher:
            self._q.put(item)

    def __iter__(self):
        return self

    def __next__(self):
        return self._q.get()
