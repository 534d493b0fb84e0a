"""Host data loader with background prefetch.

Replaces paddle.io.DataLoader + DistributedBatchSampler
(reference: paddle3d/apis/trainer.py:35-82). Threads (not processes) feed a
small prefetch queue — the heavy per-iteration work (voxelization, target
assignment) runs on-device in this framework, so the host loop only does
file IO + padding and stays light by design.
"""
import queue
import threading
from typing import Iterator

import numpy as np

__all__ = ["DataLoader"]


class DataLoader:
    def __init__(self,
                 dataset,
                 batch_size: int = 1,
                 shuffle: bool = False,
                 drop_last: bool = True,
                 seed: int = 0,
                 prefetch: int = 2,
                 num_shards: int = 1,
                 shard_index: int = 0):
        """num_shards/shard_index give DistributedBatchSampler semantics for
        multi-host runs (each process loads its own slice)."""
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.seed = seed
        self.prefetch = prefetch
        self.num_shards = num_shards
        self.shard_index = shard_index
        self.epoch = 0

    def __len__(self):
        n = len(self.dataset) // self.num_shards
        if self.drop_last:
            return n // self.batch_size
        return (n + self.batch_size - 1) // self.batch_size

    def _indices(self) -> np.ndarray:
        idx = np.arange(len(self.dataset))
        if self.shuffle:
            rng = np.random.default_rng(self.seed + self.epoch)
            rng.shuffle(idx)
        # contiguous shard per process after the global shuffle
        n = len(idx) // self.num_shards
        return idx[self.shard_index * n:(self.shard_index + 1) * n]

    def __iter__(self) -> Iterator:
        indices = self._indices()
        self.epoch += 1
        nb = len(self)
        q = queue.Queue(maxsize=self.prefetch)
        stop = threading.Event()

        def worker():
            try:
                for b in range(nb):
                    if stop.is_set():
                        return
                    chunk = indices[b * self.batch_size:(b + 1) *
                                    self.batch_size]
                    samples = [self.dataset[int(i)] for i in chunk]
                    q.put(self.dataset.collate_fn(samples))
            except Exception as e:  # surface worker errors to the consumer
                q.put(e)
            finally:
                q.put(None)

        t = threading.Thread(target=worker, daemon=True)
        t.start()
        try:
            while True:
                item = q.get()
                if item is None:
                    break
                if isinstance(item, Exception):
                    raise item
                yield item
        finally:
            stop.set()
