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
                 prefetch: int = 4,
                 num_workers: int = 4,
                 num_shards: int = 1,
                 shard_index: int = 0):
        """num_shards/shard_index give DistributedBatchSampler semantics for
        multi-host runs (each process loads its own slice). num_workers > 1
        builds batches in a thread pool (numpy transforms and file IO
        release the GIL, so threads overlap — the TPU-host analogue of the
        reference's shared-memory worker processes, apis/trainer.py:35-82);
        batch order is preserved."""
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.seed = seed
        self.prefetch = max(prefetch, num_workers)
        self.num_workers = max(1, int(num_workers))
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

    def _build(self, indices, b):
        chunk = indices[b * self.batch_size:(b + 1) * self.batch_size]
        samples = [self.dataset[int(i)] for i in chunk]
        return self.dataset.collate_fn(samples)

    def __iter__(self) -> Iterator:
        import concurrent.futures as cf

        indices = self._indices()
        self.epoch += 1
        nb = len(self)
        if self.num_workers <= 1:
            # single background thread + bounded queue
            q = queue.Queue(maxsize=self.prefetch)
            stop = threading.Event()

            def worker():
                try:
                    for b in range(nb):
                        if stop.is_set():
                            return
                        q.put(self._build(indices, b))
                except Exception as e:
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
            return

        # worker pool with a sliding window of in-flight batches
        # (order-preserving)
        with cf.ThreadPoolExecutor(max_workers=self.num_workers) as pool:
            window = {}
            next_submit = 0

            def fill():
                nonlocal next_submit
                while next_submit < nb and len(window) < self.prefetch:
                    window[next_submit] = pool.submit(
                        self._build, indices, next_submit)
                    next_submit += 1

            fill()
            for b in range(nb):
                fut = window.pop(b)
                fill()
                yield fut.result()
