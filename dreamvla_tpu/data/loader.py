"""Host data loading: sharded sampling + threaded prefetch.

Replaces torch DataLoader + DistributedSampler (reference
data_utils.py:1461-1543): per-process index sharding with epoch-seeded
shuffling and drop_last, a thread-pool that maps `dataset[i]` concurrently,
and a bounded prefetch queue so host IO overlaps device steps. A C++ frame
decoder can plug in underneath the dataset's `load` hooks (see native/).
"""

from __future__ import annotations

import dataclasses
import queue
import threading
from concurrent.futures import ThreadPoolExecutor
from typing import Any, Callable, Iterator, Optional, Sequence

import numpy as np


class ShardedSampler:
    """Epoch-seeded shuffled index shards (DistributedSampler semantics:
    pad-to-divisible, per-rank interleave, drop_last batches)."""

    def __init__(self, num_samples: int, batch_size: int, rank: int = 0,
                 world_size: int = 1, shuffle: bool = True, seed: int = 42,
                 drop_last: bool = True):
        self.num_samples = num_samples
        self.batch_size = batch_size
        self.rank, self.world_size = rank, world_size
        self.shuffle, self.seed, self.drop_last = shuffle, seed, drop_last
        self.epoch = 0

    def set_epoch(self, epoch: int) -> None:
        self.epoch = epoch

    @property
    def shard_len(self) -> int:
        return -(-self.num_samples // self.world_size)

    @property
    def num_batches(self) -> int:
        n = self.shard_len
        return n // self.batch_size if self.drop_last else -(-n // self.batch_size)

    def __iter__(self) -> Iterator[np.ndarray]:
        idx = np.arange(self.num_samples)
        if self.shuffle:
            rng = np.random.default_rng(self.seed + self.epoch)
            rng.shuffle(idx)
        pad = self.shard_len * self.world_size - len(idx)
        if pad:
            idx = np.concatenate([idx, idx[:pad]])
        shard = idx[self.rank::self.world_size]
        for b in range(self.num_batches):
            yield shard[b * self.batch_size:(b + 1) * self.batch_size]


class PrefetchLoader:
    """Iterable over collated batches with worker threads + prefetch queue."""

    def __init__(self, dataset, sampler: ShardedSampler, collate: Callable,
                 num_workers: int = 8, prefetch: int = 3):
        self.dataset = dataset
        self.sampler = sampler
        self.collate = collate
        self.num_workers = max(1, num_workers)
        self.prefetch = prefetch

    @property
    def num_batches(self) -> int:
        return self.sampler.num_batches

    def __len__(self) -> int:
        return self.num_batches

    def __iter__(self):
        q: queue.Queue = queue.Queue(maxsize=self.prefetch)
        pool = ThreadPoolExecutor(max_workers=self.num_workers)
        stop = threading.Event()

        def produce():
            try:
                for batch_idx in self.sampler:
                    if stop.is_set():
                        return
                    samples = list(pool.map(self.dataset.__getitem__, batch_idx))
                    q.put(self.collate(samples))
            except Exception as e:  # surface worker errors on the consumer
                q.put(e)
            finally:
                q.put(None)

        t = threading.Thread(target=produce, daemon=True)
        t.start()
        try:
            while True:
                item = q.get()
                if item is None:
                    return
                if isinstance(item, Exception):
                    raise item
                yield item
        finally:
            stop.set()
            pool.shutdown(wait=False)


@dataclasses.dataclass
class DataInfo:
    """Loader bundle (reference DataInfo, data_utils.py:931-942)."""

    dataloader: PrefetchLoader
    sampler: Optional[ShardedSampler] = None
    dataset: Any = None

    def set_epoch(self, epoch: int) -> None:
        if self.sampler is not None:
            self.sampler.set_epoch(epoch)
