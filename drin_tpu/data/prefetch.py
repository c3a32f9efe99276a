# -*- coding: utf-8 -*-
"""Host-side prefetching: batch assembly + device transfer run ahead of the
training step in a background thread.

The reference overlaps input work with compute via 8 DataLoader worker
processes (args.py:105); here a single background thread is enough because
batch assembly is whole-batch numpy (dataset.py) — the thread keeps a
depth-bounded queue of already-device_put batches so the device never waits
on the host (double/triple buffering via ``depth``)."""

from __future__ import annotations

import queue
import threading
from typing import Callable, Iterable, Iterator, Optional


class _Sentinel:
    pass


_END = _Sentinel()


class Prefetcher:
    """Iterate ``source`` in a background thread, applying ``transform``
    (e.g. pad + device_put) to each item, keeping up to ``depth`` transformed
    items ready.  Exceptions in the worker propagate to the consumer."""

    def __init__(self, source: Iterable, transform: Optional[Callable] = None, depth: int = 2):
        self._q: queue.Queue = queue.Queue(maxsize=max(depth, 1))
        self._transform = transform or (lambda x: x)
        self._exc: Optional[BaseException] = None
        self._thread = threading.Thread(target=self._worker, args=(iter(source),), daemon=True)
        self._thread.start()

    def _worker(self, it: Iterator):
        try:
            for item in it:
                self._q.put(self._transform(item))
        except BaseException as e:  # propagate to the consumer
            self._exc = e
        finally:
            self._q.put(_END)

    def __iter__(self):
        return self

    def __next__(self):
        item = self._q.get()
        if item is _END:
            self._thread.join()
            if self._exc is not None:
                raise self._exc
            raise StopIteration
        return item
