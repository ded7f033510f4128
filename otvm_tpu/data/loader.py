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
    # Pad to a multiple of process_count (torch DistributedSampler semantics,
    # train.py:475-480): without this, shard lengths differ by 1 when
    # n_items*repeats % process_count != 0 and the longer-shard process hangs
    # in the jitted collective on its extra final batch.
    pad = (-len(idx)) % process_count
    if pad:
        idx = np.concatenate([idx, idx[:pad]])
    return idx[process_index::process_count]


def _collate(samples: Sequence[Dict[str, np.ndarray]]) -> Dict[str, np.ndarray]:
    return {k: np.stack([s[k] for s in samples]) for k in samples[0]}


class Loader:
    """Iterable over collated batches built by `num_threads` background
    workers (the reference uses DataLoader(num_workers=8) per rank,
    train.py:294-301).

    Determinism is thread-count invariant: every sample's augmentation RNG
    is seeded by its GLOBAL position j in `indices` (not by which worker
    picked it up), workers claim whole batches from an atomic counter, and
    a reorder buffer yields batches strictly in order — N threads produce
    byte-identical batches to 1 thread."""

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

    def _sample(self, j: int):
        """Deterministic per-sample fetch: RNG keyed on the global sample
        position j, identical regardless of which thread runs it."""
        rnd = np.random.RandomState((self.seed * 1_000_003 + j) % (2 ** 31 - 1))
        return self.dataset.__getitem__(int(self.indices[j]), rnd)

    def __iter__(self) -> Iterator[Dict[str, np.ndarray]]:
        n_batches = len(self)
        bs = self.batch_size
        cond = threading.Condition()
        results: Dict[int, Dict[str, np.ndarray]] = {}
        error: List[BaseException] = []
        next_claim = [0]      # next batch index a worker may take
        next_yield = [0]      # next batch index the consumer wants
        # workers stay within `prefetch` finished-but-unconsumed batches
        # (plus one in flight per thread)
        max_ahead = self.prefetch + self.num_threads

        def worker():
            while True:
                with cond:
                    if error or next_claim[0] >= n_batches:
                        return
                    while (next_claim[0] - next_yield[0] >= max_ahead
                           and not error):
                        cond.wait(0.05)
                    if error or next_claim[0] >= n_batches:
                        return
                    i = next_claim[0]
                    next_claim[0] += 1
                try:
                    lo = i * bs
                    hi = min(lo + bs, len(self.indices))
                    batch = _collate([self._sample(j) for j in range(lo, hi)])
                except BaseException as e:  # propagate to the consumer
                    with cond:
                        error.append(e)
                        cond.notify_all()
                    return
                with cond:
                    results[i] = batch
                    cond.notify_all()

        threads = [threading.Thread(target=worker, daemon=True)
                   for _ in range(self.num_threads)]
        for t in threads:
            t.start()
        try:
            for i in range(n_batches):
                with cond:
                    while i not in results and not error:
                        cond.wait(0.05)
                    if error:
                        raise error[0]
                    item = results.pop(i)
                    next_yield[0] = i + 1
                    cond.notify_all()
                yield item
        finally:
            with cond:  # unblock + retire workers on early exit
                if not error:
                    error.append(GeneratorExit("loader closed"))
                next_claim[0] = n_batches
                cond.notify_all()


# ---------------------------------------------------------------------------
# uint8 wire format for slow host<->device links
# ---------------------------------------------------------------------------

def encode_wire(sample: Dict[str, np.ndarray]) -> Dict[str, np.ndarray]:
    """Quantize a train batch for transfer: this image's TPU is reached
    through a tunnel moving ~4-6 MB/s, so the float32 batch (~25 MB at
    b=2 320px S=3) costs ~5 s/iteration — 25x the compute.  fg/bg/alpha
    go as uint8 (their source precision: the augmented frames are /255'd
    uint8 decodes), the one-hot trimap as its label byte.  ~4.9 MB on the
    wire; `decode_wire` reconstructs inside the jitted step.  Quantization
    error <= 0.5/255 on values whose sources were 8-bit to begin with."""
    out = {}
    for k, v in sample.items():
        if k in ("fg", "bg", "alpha"):
            out[k] = np.rint(v * 255.0).astype(np.uint8)
        elif k == "tri":
            out[k] = np.argmax(v, axis=-1).astype(np.uint8)
        else:
            out[k] = v
    return out


def decode_wire(batch):
    """jnp inverse of encode_wire (run inside jit; no-op on float inputs)."""
    import jax
    import jax.numpy as jnp

    out = dict(batch)
    for k in ("fg", "bg", "alpha"):
        if k in out and out[k].dtype == jnp.uint8:
            out[k] = out[k].astype(jnp.float32) / 255.0
    if "tri" in out and out["tri"].dtype == jnp.uint8:
        out["tri"] = jax.nn.one_hot(out["tri"], 3, dtype=jnp.float32)
    return out
