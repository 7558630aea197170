"""Double-buffered host->device staging.

Replaces the reference's synchronous per-batch host work
(``DataLoader(num_workers=1)``, reference: models/cnn_action_detector.py:183)
with an iterator that keeps N batches in flight on device: while the TPU
computes on batch k, batch k+1 is already being transferred.
"""

from __future__ import annotations

import collections
import queue
import threading
from typing import Iterable, Iterator, Optional

import jax


def device_prefetch(
    iterable: Iterable,
    size: int = 2,
    sharding=None,
) -> Iterator:
    """Yield items of ``iterable`` after placing them on device, keeping
    ``size`` transfers ahead of the consumer.

    Each item is a pytree of host arrays; placement uses ``jax.device_put``
    (with ``sharding`` when given, e.g. a batch NamedSharding over the
    'data' axis of a mesh).
    """
    it = iter(iterable)
    buf = collections.deque()

    def put(item):
        if sharding is not None:
            return jax.tree_util.tree_map(lambda x: jax.device_put(x, sharding), item)
        return jax.tree_util.tree_map(jax.device_put, item)

    try:
        for _ in range(size):
            buf.append(put(next(it)))
    except StopIteration:
        pass

    while buf:
        out = buf.popleft()
        try:
            buf.append(put(next(it)))
        except StopIteration:
            pass
        yield out


class BackgroundIterator:
    """Run a (host-heavy) iterator in a background thread with a bounded
    queue, overlapping host batch assembly with device compute.

    Single-shot.  ``close()`` (also called when iteration finishes or the
    consumer abandons it via ``with``/GC) unblocks and stops the producer
    so early-exiting training loops don't leak a thread pinning prefetched
    batches.
    """

    _SENTINEL = object()

    def __init__(self, iterable: Iterable, maxsize: int = 4):
        self._queue: queue.Queue = queue.Queue(maxsize=maxsize)
        self._error: Optional[BaseException] = None
        self._stopped = threading.Event()
        self._thread = threading.Thread(target=self._run, args=(iterable,), daemon=True)
        self._thread.start()

    def _run(self, iterable):
        try:
            for item in iterable:
                if self._stopped.is_set():
                    return
                while not self._stopped.is_set():
                    try:
                        self._queue.put(item, timeout=0.2)
                        break
                    except queue.Full:
                        continue
        except BaseException as e:  # propagate into the consumer
            self._error = e
        finally:
            # The sentinel MUST reach the consumer: a put_nowait here gets
            # dropped whenever the queue is still full of pending batches
            # (fast producer + slow device), leaving the consumer blocked
            # in get() forever after draining them.  Block-put with the
            # same stopped-poll the item path uses.
            while not self._stopped.is_set():
                try:
                    self._queue.put(self._SENTINEL, timeout=0.2)
                    break
                except queue.Full:
                    continue

    def close(self):
        self._stopped.set()
        try:
            while True:
                self._queue.get_nowait()
        except queue.Empty:
            pass
        self._thread.join(timeout=5.0)

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()

    def __del__(self):
        self._stopped.set()

    def __iter__(self):
        while True:
            item = self._queue.get()
            if item is self._SENTINEL:
                if self._error is not None:
                    raise self._error
                return
            yield item
