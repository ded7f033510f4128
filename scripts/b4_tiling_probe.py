"""B=4 inference conv-tiling investigation (VERDICT r2 #10).

r2 found XLA doubles per-frame HBM bytes at B=4 512p eval (21.3 vs 10.8 GB
per frame at B=1), making batched serving SLOWER per stream than 4 separate
B=1 streams.  This probe:
  1. re-measures the eval step at each requested B (cost-analysis bytes +
     measured ms/frame);
  2. measures the mitigation (--serialize N): N concurrent streams served
     as N interleaved B=1 dispatches with independent memory banks — the
     per-sample conv tilings stay the (good) B=1 shapes and the already-
     compiled B=1 executable is reused, at the cost of N host dispatches
     per frame-time (hidden by dispatch pipelining).

Usage: python scripts/b4_tiling_probe.py [--size 512] [--frames 8]
                                         [--batches 1,4] [--serialize 4]
Prints one JSON line per experiment.
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

V5E_HBM_PEAK = 819e9


def bench_eval(B, H, W, frames, chunk=1):
    import jax
    import jax.numpy as jnp

    from otvm_tpu.config import get_cfg_defaults
    from otvm_tpu.models.otvm import eval_frame_step, make_eval_bank
    from otvm_tpu.train.trainer import init_train_state

    cfg = get_cfg_defaults()
    cfg.train.stage = 4
    state = init_train_state(cfg, jax.random.PRNGKey(0), None, 64, 96)
    stm_vars = {"params": state.params["stm"], "batch_stats": state.batch_stats}
    fba_vars = {"params": state.params["fba"]}

    rng = np.random.RandomState(0)
    frame = jnp.asarray(rng.rand(B, H, W, 3), jnp.float32)
    tri = np.zeros((B, H, W, 3), np.float32)
    tri[..., 0] = 1
    tri[:, H // 4:3 * H // 4, W // 4:3 * W // 4] = (0, 1, 0)
    tri[:, 3 * H // 8:5 * H // 8, 3 * W // 8:5 * W // 8] = (0, 0, 1)
    tri = jnp.asarray(tri)
    bank = make_eval_bank(B, H, W, 5)

    t0 = time.perf_counter()
    out = eval_frame_step(stm_vars, fba_vars, bank, frame, tri,
                          jnp.asarray(True), jnp.asarray(True),
                          jnp.asarray(False), stage=4, max_memory_num=5)
    jax.block_until_ready(out.alpha)
    compile_s = time.perf_counter() - t0
    bank = out.bank

    t0 = time.perf_counter()
    for i in range(frames):
        out = eval_frame_step(stm_vars, fba_vars, bank, frame, tri,
                              jnp.asarray(False), jnp.asarray(i % 3 == 0),
                              jnp.asarray(False), stage=4, max_memory_num=5)
        bank = out.bank
    jax.block_until_ready(out.alpha)
    ms = (time.perf_counter() - t0) / frames * 1000.0

    rec = dict(B=B, size=f"{H}x{W}", ms_per_dispatch=round(ms, 2),
               fps_per_stream=round(1000.0 / ms, 2),
               fps_aggregate=round(1000.0 / ms * B, 2),
               compile_s=round(compile_s, 1))
    try:
        lowered = eval_frame_step.lower(
            stm_vars, fba_vars, bank, frame, tri, jnp.asarray(False),
            jnp.asarray(True), jnp.asarray(False), stage=4, max_memory_num=5)
        cost = lowered.compile().cost_analysis()
        by = cost.get("bytes accessed", 0.0)
        rec["xla_gb_per_dispatch"] = round(by / 1e9, 2)
        rec["xla_gb_per_stream_frame"] = round(by / 1e9 / B, 2)
        rec["hbm_util_pct"] = round(by / (ms / 1e3) / V5E_HBM_PEAK * 100, 1)
    except Exception as e:
        rec["cost_err"] = str(e)
    print(json.dumps(rec), flush=True)
    return rec


def bench_serialized(n_streams, H, W, frames):
    """The mitigation: n_streams independent B=1 streams, round-robin
    dispatched against per-stream banks.  Same compiled executable as B=1;
    dispatches pipeline, so aggregate throughput ~= n_streams * B=1 rate
    bounded by chip compute, instead of paying B=4's 1.6x byte blowup."""
    import jax
    import jax.numpy as jnp

    from otvm_tpu.config import get_cfg_defaults
    from otvm_tpu.models.otvm import eval_frame_step, make_eval_bank
    from otvm_tpu.train.trainer import init_train_state

    cfg = get_cfg_defaults()
    cfg.train.stage = 4
    state = init_train_state(cfg, jax.random.PRNGKey(0), None, 64, 96)
    stm_vars = {"params": state.params["stm"], "batch_stats": state.batch_stats}
    fba_vars = {"params": state.params["fba"]}

    rng = np.random.RandomState(0)
    frame = jnp.asarray(rng.rand(1, H, W, 3), jnp.float32)
    tri = np.zeros((1, H, W, 3), np.float32)
    tri[..., 0] = 1
    tri[:, H // 4:3 * H // 4, W // 4:3 * W // 4] = (0, 1, 0)
    tri[:, 3 * H // 8:5 * H // 8, 3 * W // 8:5 * W // 8] = (0, 0, 1)
    tri = jnp.asarray(tri)
    T, F = jnp.asarray(True), jnp.asarray(False)

    banks = []
    t0 = time.perf_counter()
    for _ in range(n_streams):
        out = eval_frame_step(stm_vars, fba_vars, make_eval_bank(1, H, W, 5),
                              frame, tri, T, T, F, stage=4, max_memory_num=5)
        banks.append(out.bank)
    jax.block_until_ready(out.alpha)
    compile_s = time.perf_counter() - t0

    t0 = time.perf_counter()
    for i in range(frames):
        mem = T if i % 3 == 0 else F
        for s in range(n_streams):
            out = eval_frame_step(stm_vars, fba_vars, banks[s], frame, tri,
                                  F, mem, F, stage=4, max_memory_num=5)
            banks[s] = out.bank
    jax.block_until_ready(out.alpha)
    ms = (time.perf_counter() - t0) / frames * 1000.0  # per frame-time, all streams

    print(json.dumps(dict(
        mode=f"serialize_{n_streams}x_b1", size=f"{H}x{W}",
        ms_per_frame_all_streams=round(ms, 2),
        fps_per_stream=round(1000.0 / ms, 2),
        fps_aggregate=round(1000.0 / ms * n_streams, 2),
        compile_s=round(compile_s, 1))), flush=True)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--size", type=int, default=512)
    p.add_argument("--frames", type=int, default=8)
    p.add_argument("--batches", default="1,4")
    p.add_argument("--serialize", type=int, default=0,
                   help="also measure N interleaved B=1 streams (mitigation)")
    args = p.parse_args()
    H = W = args.size
    for B in (int(b) for b in args.batches.split(",") if b):
        bench_eval(B, H, W, args.frames)
    if args.serialize:
        bench_serialized(args.serialize, H, W, args.frames)


if __name__ == "__main__":
    main()
