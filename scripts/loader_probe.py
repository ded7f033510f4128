"""Data-loader throughput probe (VERDICT r2 weak #7: thread-count
*invariance* is tested but feed rate never measured).

Measures samples/s of the real `Loader` over DIMTrain and VM108Train at the
training crop for num_threads in {1, 2, 4, 8}, so we know whether N threads
actually outrun 1 (the aug chain is numpy/cv2-heavy; cv2 releases the GIL,
numpy only partially) and whether the pipeline can feed the measured TPU
train step (~5 steps/s at b=1, docs/BENCH_NOTES.md).

Usage: python scripts/loader_probe.py [--data-root /tmp/synth_data]
Prints one JSON line per (dataset, threads) combination.
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from otvm_tpu.data.datasets import DIMTrain, VM108Train
from otvm_tpu.data.loader import Loader, epoch_indices


def probe(name, dataset, threads, batch_size, n_batches, warm=2):
    idx = epoch_indices(len(dataset), epoch=0, repeats=20)
    idx = idx[: (n_batches + warm) * batch_size]
    loader = Loader(dataset, idx, batch_size, seed=0, num_threads=threads)
    it = iter(loader)
    for _ in range(warm):
        next(it)
    t0 = time.perf_counter()
    got = 0
    for _ in range(n_batches):
        next(it)
        got += batch_size
    dt = time.perf_counter() - t0
    rec = dict(dataset=name, threads=threads, batch_size=batch_size,
               samples_per_s=round(got / dt, 2),
               batches_per_s=round(n_batches / dt, 3))
    print(json.dumps(rec), flush=True)
    return rec


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--data-root", default="/tmp/synth_data")
    p.add_argument("--size", type=int, default=320)
    p.add_argument("--frames", type=int, default=3)
    p.add_argument("--batch-size", type=int, default=4)
    p.add_argument("--batches", type=int, default=12)
    args = p.parse_args()

    hw = (args.size, args.size)
    dim = DIMTrain.from_adobe_layout(args.data_root, image_shape=hw,
                                     sample_length=args.frames)
    vm = VM108Train(args.data_root, hw, args.frames)
    out = []
    for threads in (1, 2, 4, 8):
        out.append(probe("DIM", dim, threads, args.batch_size, args.batches))
    for threads in (1, 2, 4, 8):
        out.append(probe("VM108", vm, threads, args.batch_size, args.batches))
    with open("/tmp/loader_probe.json", "w") as f:
        json.dump(out, f, indent=2)


if __name__ == "__main__":
    main()
