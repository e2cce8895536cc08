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

    def _epoch_indices(self, epoch: int) -> np.ndarray:
        idx = np.arange(len(self.dataset))
        if self.shuffle:
            rng = np.random.default_rng(self.seed * 1000003 + epoch)
            rng.shuffle(idx)
        return idx

    def _assemble(self, indices) -> Dict[str, np.ndarray]:
        samples = [self.dataset[int(i)] for i in indices]
        return {
            k: np.stack([s[k] for s in samples], axis=0) for k in samples[0]
        }

    def _batches(self, epoch: int) -> Iterator[Dict[str, np.ndarray]]:
        idx = self._epoch_indices(epoch)
        nb = len(self)
        for b in range(nb):
            global_slice = idx[b * self.batch_size : (b + 1) * self.batch_size]
            pad = 0
            if len(global_slice) < self.batch_size:
                if self.drop_remainder:
                    return
                # wrap-pad the final partial batch
                pad = self.batch_size - len(global_slice)
                global_slice = np.concatenate([global_slice, idx[:pad]])
            sl = slice(
                self.process_index * self.local_batch,
                (self.process_index + 1) * self.local_batch,
            )
            batch = self._assemble(global_slice[sl])
            if pad:
                # Zero the valid mask of wrap-padded duplicates so
                # pixel-weighted evaluation does not double-count them.
                pad_flags = np.zeros(self.batch_size, bool)
                pad_flags[-pad:] = True
                local_flags = pad_flags[sl]
                for k in ("valid", "valid_right"):
                    if k in batch and local_flags.any():
                        batch[k] = batch[k] * (
                            ~local_flags[:, None, None]
                        ).astype(batch[k].dtype)
            yield batch

    def __iter__(self) -> Iterator[Dict[str, np.ndarray]]:
        # Advance the shuffle epoch up front so a consumer that breaks out
        # early (e.g. Trainer.fit at steps_per_epoch) still gets a fresh
        # permutation on the next pass.
        epoch = self.epoch
        self.epoch += 1
        if self.prefetch <= 0:
            yield from self._batches(epoch)
            return
        q: "queue.Queue" = queue.Queue(maxsize=self.prefetch)
        sentinel = object()
        stop = threading.Event()
        err: list = []

        def producer():
            try:
                for batch in self._batches(epoch):
                    # Bounded put that re-checks the stop flag so an
                    # abandoned iterator cannot leak a thread blocked on a
                    # full queue forever.
                    while not stop.is_set():
                        try:
                            q.put(batch, timeout=0.1)
                            break
                        except queue.Full:
                            continue
                    if stop.is_set():
                        return
            except BaseException as e:  # surface worker errors to consumer
                err.append(e)
            finally:
                try:
                    q.put_nowait(sentinel)
                except queue.Full:
                    pass

        t = threading.Thread(target=producer, daemon=True)
        t.start()
        try:
            while True:
                item = q.get()
                if item is sentinel:
                    break
                yield item
            t.join()
            if err:
                raise err[0]
        finally:
            # Runs on normal completion AND on GeneratorExit (consumer broke
            # out / iterator was garbage-collected): unblock and reap the
            # producer thread.
            stop.set()
            while True:
                try:
                    q.get_nowait()
                except queue.Empty:
                    break
            t.join(timeout=5.0)
