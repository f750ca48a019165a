"""Host-side batch loading with threaded prefetch.

Replaces the reference's ``torch.utils.data.DataLoader(batch_size=1,
num_workers=10)`` (``tools/train.py:106``) with a true-batch loader: samples
are assembled by a thread pool (numpy/PIL release the GIL), collated into
(B, ...) arrays, and prefetched a few batches ahead so TPU steps never wait on
IO. Device placement (with mesh sharding) happens in the train loop via
``jax.device_put`` — each host feeds only its shard on multi-host meshes
(SURVEY.md §2.3, §5.8).

Determinism: order is a pure function of (seed, epoch); combined with the
checkpointed batch cursor this makes mid-epoch restart exact (SURVEY.md §5.3).
"""

from __future__ import annotations

import queue
import threading
from concurrent.futures import ThreadPoolExecutor
from typing import Callable, Iterator

import numpy as np

from densefusion_tpu.data.schema import collate


class BatchLoader:
    def __init__(self, dataset, batch_size: int, shuffle: bool = True,
                 collate_fn: Callable = collate, drop_last: bool = True,
                 num_workers: int = 4, seed: int = 0):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.collate_fn = collate_fn
        self.drop_last = drop_last
        self.num_workers = num_workers
        self.seed = seed

    def __len__(self):
        n = len(self.dataset)
        return n // self.batch_size if self.drop_last else -(-n // self.batch_size)

    def batch_indices(self, epoch: int = 0) -> list[np.ndarray]:
        order = np.arange(len(self.dataset))
        if self.shuffle:
            np.random.default_rng((self.seed, epoch)).shuffle(order)
        n_full = len(order) // self.batch_size
        batches = [order[i * self.batch_size:(i + 1) * self.batch_size]
                   for i in range(n_full)]
        rem = order[n_full * self.batch_size:]
        if rem.size and not self.drop_last:
            batches.append(rem)
        return batches

    def epoch(self, epoch: int = 0, start_batch: int = 0) -> Iterator:
        """Iterate batches of one epoch, optionally resuming mid-epoch."""
        if hasattr(self.dataset, "set_epoch"):
            # per-sample RNG derives from (seed, epoch, index): thread-safe
            # and bit-reproducible regardless of worker scheduling
            self.dataset.set_epoch(epoch)
        batches = self.batch_indices(epoch)[start_batch:]
        if self.num_workers <= 1:
            for idx in batches:
                yield self.collate_fn([self.dataset[int(i)] for i in idx])
            return
        # sliding-window submission: the next batches' samples assemble in
        # the pool WHILE the current batch is collated/consumed — a per-batch
        # pool.map barrier serialized collate against assembly and capped
        # throughput well below the pool's sample rate
        ahead = 2
        with ThreadPoolExecutor(self.num_workers) as pool:
            pending: list[list] = []
            next_batch = 0

            def submit(idx):
                return [pool.submit(self.dataset.__getitem__, int(i))
                        for i in idx]

            while next_batch < len(batches) and len(pending) <= ahead:
                pending.append(submit(batches[next_batch]))
                next_batch += 1
            while pending:
                futs = pending.pop(0)
                if next_batch < len(batches):
                    pending.append(submit(batches[next_batch]))
                    next_batch += 1
                yield self.collate_fn([f.result() for f in futs])

    def __iter__(self):
        return self.epoch(0)


class PrefetchIterator:
    """Run an iterator in a background thread, keeping `depth` items ready."""

    _END = object()

    def __init__(self, it: Iterator, depth: int = 2):
        self._q: queue.Queue = queue.Queue(maxsize=depth)
        self._err: BaseException | None = None

        def worker():
            try:
                for item in it:
                    self._q.put(item)
            except BaseException as e:  # propagate into the consumer
                self._err = e
            finally:
                self._q.put(self._END)

        self._thread = threading.Thread(target=worker, daemon=True)
        self._thread.start()

    def __iter__(self):
        return self

    def __next__(self):
        item = self._q.get()
        if item is self._END:
            if self._err is not None:
                raise self._err
            raise StopIteration
        return item
