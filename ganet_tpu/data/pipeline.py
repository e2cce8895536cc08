"""Batching/prefetching pipeline.

The reference feeds training with torch DataLoader worker processes
(SURVEY.md §3.1 "process/device boundaries").  The TPU-native equivalent
is a host-side numpy pipeline that (a) shards the sample index space by
JAX process so each host reads only its slice of the global batch, and
(b) prefetches batches on a background thread so host IO overlaps device
compute.
"""

from __future__ import annotations

import queue
import threading
from typing import Dict, Iterator, Optional

import numpy as np


class BatchIterator:
    """Iterates dict-of-array batches over a map-style dataset.

    Args:
      dataset: object with __len__ / __getitem__ -> dict[str, np.ndarray].
      batch_size: GLOBAL batch size; each host yields batch_size //
        num_processes samples (reference semantics: --batchSize is global).
      shuffle: reshuffle each epoch (seeded, identical across hosts).
      process_index/process_count: JAX process coordinates for multi-host
        sharding.
      prefetch: number of batches to stage on a background thread.
    """

    def __init__(
        self,
        dataset,
        batch_size: int,
        shuffle: bool = True,
        seed: int = 0,
        drop_remainder: bool = True,
        process_index: int = 0,
        process_count: int = 1,
        prefetch: int = 2,
    ):
        if batch_size % process_count != 0:
            raise ValueError(
                f"global batch {batch_size} not divisible by {process_count} hosts"
            )
        self.dataset = dataset
        self.batch_size = batch_size
        self.local_batch = batch_size // process_count
        self.shuffle = shuffle
        self.seed = seed
        self.drop_remainder = drop_remainder
        self.process_index = process_index
        self.process_count = process_count
        self.prefetch = prefetch
        self.epoch = 0

    def __len__(self) -> int:
        n = len(self.dataset) // self.batch_size
        if not self.drop_remainder and len(self.dataset) % self.batch_size:
            n += 1
        return n

    def _epoch_indices(self) -> np.ndarray:
        idx = np.arange(len(self.dataset))
        if self.shuffle:
            rng = np.random.default_rng(self.seed * 1000003 + self.epoch)
            rng.shuffle(idx)
        return idx

    def _assemble(self, indices) -> Dict[str, np.ndarray]:
        samples = [self.dataset[int(i)] for i in indices]
        return {
            k: np.stack([s[k] for s in samples], axis=0) for k in samples[0]
        }

    def _batches(self) -> Iterator[Dict[str, np.ndarray]]:
        idx = self._epoch_indices()
        nb = len(self)
        for b in range(nb):
            global_slice = idx[b * self.batch_size : (b + 1) * self.batch_size]
            if len(global_slice) < self.batch_size:
                if self.drop_remainder:
                    return
                # wrap-pad the final partial batch
                pad = self.batch_size - len(global_slice)
                global_slice = np.concatenate([global_slice, idx[:pad]])
            local = global_slice[
                self.process_index * self.local_batch : (self.process_index + 1)
                * self.local_batch
            ]
            yield self._assemble(local)
        self.epoch += 1

    def __iter__(self) -> Iterator[Dict[str, np.ndarray]]:
        if self.prefetch <= 0:
            yield from self._batches()
            return
        q: "queue.Queue" = queue.Queue(maxsize=self.prefetch)
        sentinel = object()
        err: list = []

        def producer():
            try:
                for batch in self._batches():
                    q.put(batch)
            except BaseException as e:  # surface worker errors to consumer
                err.append(e)
            finally:
                q.put(sentinel)

        t = threading.Thread(target=producer, daemon=True)
        t.start()
        while True:
            item = q.get()
            if item is sentinel:
                break
            yield item
        t.join()
        if err:
            raise err[0]
