"""Async host->device feed.

The reference uploads each batch synchronously after assembling it
(bcnn_loader_next's cudaMemcpy, bcnn_data.c:413-425). On TPU the equivalent
is a double-buffered prefetch: a background thread assembles+augments the
next batch (numpy) while the device computes on the current one, and
`jax.device_put` overlaps the transfer.
"""

from __future__ import annotations

import queue
import threading
from typing import Iterator, Optional, Tuple

import jax
import numpy as np


class BatchPipeline:
    def __init__(self, loader, depth: int = 2, sharding=None):
        """loader: DataLoader with next_batch(); depth: prefetch depth;
        sharding: optional jax sharding for the device placement."""
        self.loader = loader
        self.sharding = sharding
        self._q: queue.Queue = queue.Queue(maxsize=depth)
        self._stop = threading.Event()
        self._thread: Optional[threading.Thread] = None

    def _worker(self):
        while not self._stop.is_set():
            try:
                batch = self.loader.next_batch()
            except Exception as e:  # surface loader errors to the consumer
                self._q.put(e)
                return
            x, y = batch
            if self.sharding is not None:
                x = jax.device_put(x, self.sharding)
                y = jax.device_put(y, self.sharding)
            else:
                x = jax.device_put(x)
                y = jax.device_put(y)
            while not self._stop.is_set():
                try:
                    self._q.put((x, y), timeout=0.25)
                    break
                except queue.Full:
                    continue

    def start(self) -> "BatchPipeline":
        self._thread = threading.Thread(target=self._worker, daemon=True)
        self._thread.start()
        return self

    def __iter__(self) -> Iterator[Tuple[jax.Array, jax.Array]]:
        if self._thread is None:
            self.start()
        while True:
            item = self._q.get()
            if isinstance(item, Exception):
                raise item
            yield item

    def stop(self):
        self._stop.set()
        if self._thread:
            try:
                while True:
                    self._q.get_nowait()
            except queue.Empty:
                pass
            self._thread.join(timeout=2.0)
            self._thread = None
