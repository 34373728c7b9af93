"""Host-side pipeline acceleration.

The reference's only input/compute overlap is pix2pix's TF1 queue runners
(SURVEY.md §3.2); everything else blocks the train loop on feed_dict
generation. Here any DataSource can be wrapped in ``ThreadedSource`` — N
daemon workers each iterate an independently-seeded copy of the source into a
bounded queue, so host batch production overlaps device compute (numpy
releases the GIL in its hot ops, so threads scale for array-heavy loaders).
"""

from __future__ import annotations

import copy
import queue
import threading
from typing import Dict, Iterator

import numpy as np

from .base import DataSource


class ThreadedSource(DataSource):
    """Parallel, prefetching wrapper around a DataSource.

    Batch ORDER is not preserved across workers (irrelevant for shuffled
    training streams). Each worker reseeds its copy (seed + worker_id) so
    streams are disjoint.
    """

    def __init__(self, source: DataSource, num_workers: int = 2, depth: int = 8):
        self.source = source
        self.batch_size = source.batch_size
        self.num_workers = num_workers
        self.depth = depth

    def __iter__(self) -> Iterator[Dict[str, np.ndarray]]:
        q: queue.Queue = queue.Queue(maxsize=self.depth)
        stop = threading.Event()

        def worker(wid: int):
            try:
                base_seed = getattr(self.source, "seed", 0)
                src = self.source.reseeded(base_seed + 1000003 * (wid + 1))
                it = iter(src)
                while not stop.is_set():
                    batch = next(it)
                    while not stop.is_set():
                        try:
                            q.put(batch, timeout=0.1)
                            break
                        except queue.Full:
                            continue
            except BaseException as e:  # surface loader errors to the consumer
                while not stop.is_set():
                    try:
                        q.put(e, timeout=0.1)
                        break
                    except queue.Full:
                        continue

        threads = [threading.Thread(target=worker, args=(i,), daemon=True)
                   for i in range(self.num_workers)]
        for t in threads:
            t.start()
        try:
            while True:
                item = q.get()
                if isinstance(item, BaseException):
                    raise RuntimeError(
                        "ThreadedSource worker failed; see chained error") from item
                yield item
        finally:
            stop.set()
