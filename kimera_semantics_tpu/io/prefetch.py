"""Background frame prefetch for the streaming server.

The reference leans on ROS queueing between the bag reader and the
integrator callback (rosbag_data_provider.cpp publishes on a timer; the
subscriber queue decouples IO from integration). Here the equivalent is a
bounded producer thread: dataset decode (npz read, synthetic render) runs
ahead of the device while JAX's async dispatch keeps the chip busy —
`SemanticTsdfServer.run` only blocks on grid state at mesh/stat boundaries.

The queue depth is intentionally small (default 2): deep readahead buys
nothing once the device is saturated and holds frame buffers alive.
"""

from __future__ import annotations

import queue
import threading
from typing import Iterable, Iterator, TypeVar

T = TypeVar("T")

_SENTINEL = object()


def prefetch(iterable: Iterable[T], depth: int = 2) -> Iterator[T]:
    """Yield items of `iterable`, produced by a background thread through a
    bounded queue. Order-preserving; producer exceptions re-raise at the
    consumption point. depth <= 0 yields the iterable unchanged."""
    if depth <= 0:
        yield from iterable
        return
    q: queue.Queue = queue.Queue(maxsize=depth)
    err: list = []

    def worker():
        try:
            for item in iterable:
                q.put(item)
        except BaseException as e:  # re-raised on the consumer side
            err.append(e)
        finally:
            q.put(_SENTINEL)

    t = threading.Thread(target=worker, daemon=True, name="ksd-prefetch")
    t.start()
    while True:
        item = q.get()
        if item is _SENTINEL:
            t.join()
            if err:
                raise err[0]
            return
        yield item
