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

    def stop(self) -> bool:
        """Returns True when the worker thread actually exited (callers
        may only tear down the loader underneath it in that case)."""
        self._stop.set()
        joined = True
        if self._thread:
            try:
                while True:
                    self._q.get_nowait()
            except queue.Empty:
                pass
            self._thread.join(timeout=2.0)
            joined = not self._thread.is_alive()
            self._thread = None
        return joined


class ShardedBatchPipeline:
    """Parallel host-side data loading that PRESERVES the sequential
    stream's batch order.

    The reference's loader is a single sequential FILE* stream
    (bcnn_loader_next, bcnn_data.c:392-427) — fine for its CPU trainer,
    but one Python thread cannot decode+augment fast enough to feed a
    TPU train step. This reuses the multi-host stripe partition
    (DataLoader.set_shard) ACROSS THREADS: each of W workers owns a
    private loader striped (w, W) over the same files, so worker w
    assembles the w-th b-sample slice of every W*b-sample window.
    Consuming the per-worker queues round-robin therefore reproduces
    EXACTLY the single-stream batch order while decode and augmentation
    run W-wide (PIL decode and the numpy/bip kernels release the GIL).

    Semantics note: sample order, labels, EOF rewind and skip-bad-sample
    follow the per-shard stream semantics of set_shard. Each worker owns
    its augmenter's RNG stream, so AUGMENTED pixel values draw from
    per-worker streams (the 1-worker path is the reference-parity one).
    """

    def __init__(self, loader_factory, workers: int = 2, depth: int = 2,
                 sharding=None):
        if workers < 1:
            raise ValueError(f"workers must be >= 1, got {workers}")
        self.loaders = []
        for w in range(workers):
            ld = loader_factory()
            ld.set_shard(w, workers)
            aug = getattr(ld, "augmenter", None)
            if aug is not None and w > 0:
                # every factory-made loader starts from the same seed;
                # decorrelate the per-worker augmentation streams (worker
                # 0 keeps the original stream — the 1-worker parity path)
                aug.rng = np.random.RandomState(
                    (aug.rng.randint(1 << 31) + w) & 0x7FFFFFFF
                )
            self.loaders.append(ld)
        self.pipes = [
            BatchPipeline(ld, depth=depth, sharding=sharding)
            for ld in self.loaders
        ]

    def start(self) -> "ShardedBatchPipeline":
        for p in self.pipes:
            p.start()
        return self

    def __iter__(self) -> Iterator[Tuple[jax.Array, jax.Array]]:
        its = [iter(p) for p in self.pipes]
        while True:
            for it in its:
                yield next(it)

    def stop(self):
        for p, ld in zip(self.pipes, self.loaders):
            # close the loader only once its worker has really exited —
            # a thread still blocked in a slow decode would otherwise
            # read from a closed file
            if p.stop():
                ld.close()
