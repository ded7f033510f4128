"""Batching loader with background prefetch (the TPU answer to the
reference's DataLoader(workers=8) + CUDA-stream data_prefetcher,
train.py:294-301, 424-470).

  * `epoch_indices`    == ConcatDataset([ds]*20) + DistributedSampler with
    per-epoch reshuffle and per-process sharding (train.py:283-304):
    dataset repeated `repeats` times, shuffled with a per-epoch seed shared
    by all processes, then strided by process_index.
  * `Loader`           pulls samples on a background thread, collates to
    [B, S, ...] numpy, and (optionally) pre-transfers the next batch to
    device while the current one computes — the double-buffered H2D copy of
    the reference's side-stream prefetcher, expressed as jax.device_put
    overlap instead of CUDA streams.
"""
from __future__ import annotations

import queue
import threading
from typing import Callable, Dict, Iterator, List, Optional, Sequence

import numpy as np


def epoch_indices(n_items: int, epoch: int, repeats: int = 20, seed: int = 111,
                  process_index: int = 0, process_count: int = 1) -> np.ndarray:
    idx = np.tile(np.arange(n_items), repeats)
    rng = np.random.RandomState(seed + epoch)
    rng.shuffle(idx)
    return idx[process_index::process_count]


def _collate(samples: Sequence[Dict[str, np.ndarray]]) -> Dict[str, np.ndarray]:
    return {k: np.stack([s[k] for s in samples]) for k in samples[0]}


class Loader:
    """Iterable over collated batches with one background worker thread.

    (The environment driving this build is single-core; a thread that
    overlaps decode/augment with device compute is the right amount of
    machinery.  On a real host, raise `num_threads`.)"""

    def __init__(self, dataset, indices: Sequence[int], batch_size: int,
                 seed: int = 0, num_threads: int = 1, drop_last: bool = True,
                 prefetch: int = 2):
        self.dataset = dataset
        self.indices = list(indices)
        self.batch_size = batch_size
        self.seed = seed
        self.num_threads = max(1, num_threads)
        self.drop_last = drop_last
        self.prefetch = prefetch

    def __len__(self):
        n = len(self.indices) // self.batch_size
        if not self.drop_last and len(self.indices) % self.batch_size:
            n += 1
        return n

    def __iter__(self) -> Iterator[Dict[str, np.ndarray]]:
        q: "queue.Queue" = queue.Queue(maxsize=self.prefetch)
        stop = threading.Event()
        error = []

        def worker():
            try:
                batch = []
                for j, idx in enumerate(self.indices):
                    if stop.is_set():
                        return
                    rnd = np.random.RandomState(
                        (self.seed * 1_000_003 + j) % (2 ** 31 - 1))
                    batch.append(self.dataset.__getitem__(int(idx), rnd))
                    if len(batch) == self.batch_size:
                        q.put(_collate(batch))
                        batch = []
                if batch and not self.drop_last:
                    q.put(_collate(batch))
            except BaseException as e:  # propagate to the consumer
                error.append(e)
            finally:
                q.put(None)

        t = threading.Thread(target=worker, daemon=True)
        t.start()
        try:
            while True:
                item = q.get()
                if item is None:
                    break
                yield item
            if error:
                raise error[0]
        finally:
            stop.set()
