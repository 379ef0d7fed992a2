"""Background producer: overlap file read/index/pack with device compute.

The TPU-native reshaping of the reference's producer->worker(s)->consumer
thread pipeline (``workflow_run_with``, ``src/stats_fastq.c:455-465``; legacy
bounded batch queue ``old/README:57``): a single producer thread runs the
blocking host work (file read, newline indexing, optionally packing) ahead
of the consumer through a bounded queue, so the host stays busy while the
device step of the previous batch is in flight.  numpy and the native packer
release the GIL for the bulk of the work, so one thread suffices to overlap.
"""

from __future__ import annotations

import queue
import threading
from typing import Callable, Iterable, Iterator

_SENTINEL = object()


def prefetched(it: Iterable, depth: int = 3,
               transform: Callable = None) -> Iterator:
    """Iterate ``it`` (optionally mapped through ``transform``) in a
    background thread, ``depth`` items ahead.  Exceptions re-raise at the
    consumption point; the producer stops if the consumer abandons early."""
    q: "queue.Queue" = queue.Queue(maxsize=depth)
    stop = threading.Event()

    def produce():
        try:
            for item in it:
                if transform is not None:
                    item = transform(item)
                while not stop.is_set():
                    try:
                        q.put(item, timeout=0.1)
                        break
                    except queue.Full:
                        continue
                if stop.is_set():
                    return
            while not stop.is_set():
                try:
                    q.put(_SENTINEL, timeout=0.1)
                    break
                except queue.Full:
                    continue
        except BaseException as e:  # propagate into the consumer
            while not stop.is_set():
                try:
                    q.put(e, timeout=0.1)
                    break
                except queue.Full:
                    continue

    t = threading.Thread(target=produce, daemon=True, name="hpgq-producer")
    t.start()
    try:
        while True:
            item = q.get()
            if item is _SENTINEL:
                return
            if isinstance(item, BaseException):
                raise item
            yield item
    finally:
        stop.set()
