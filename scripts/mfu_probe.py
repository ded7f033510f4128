"""Utilization probe for the streaming joint step: XLA's own FLOP count
(compiled.cost_analysis) over the measured steady-state step time -> MFU
against the v5e bf16 peak.  Optionally dumps a jax.profiler trace.

Usage:
  BENCH_RES=512x512 python scripts/mfu_probe.py [--trace /tmp/otvm_trace]
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

H, W = (int(x) for x in os.environ.get("BENCH_RES", "512x512").split("x"))
B = int(os.environ.get("BENCH_BATCH", "1"))
DTYPE = os.environ.get("BENCH_DTYPE", "bf16")
V5E_BF16_PEAK = 197e12  # TFLOP/s per chip (public v5e spec)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--trace", default=None)
    p.add_argument("--frames", type=int, default=40)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from otvm_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()

    from otvm_tpu.config import get_cfg_defaults
    from otvm_tpu.models.memory import init_bank
    from otvm_tpu.models.otvm import eval_frame_step
    from otvm_tpu.train.trainer import init_train_state

    cfg = get_cfg_defaults()
    cfg.train.stage = 4
    state = init_train_state(cfg, jax.random.PRNGKey(0), None, 64, 64)
    dtype = jnp.bfloat16 if DTYPE == "bf16" else jnp.float32
    cast = lambda t: jax.tree_util.tree_map(
        lambda x: x.astype(dtype) if x.dtype == jnp.float32 else x, t)
    stm_vars = cast({"params": state.params["stm"],
                     "batch_stats": state.batch_stats})
    fba_vars = cast({"params": state.params["fba"]})

    bank = init_bank(B, (H // 16) * (W // 16), 5, dtype=dtype)
    rng = np.random.RandomState(0)
    frame = jnp.asarray(rng.rand(B, H, W, 3), dtype)
    tri = np.zeros((B, H, W, 3), np.float32)
    tri[..., 0] = 1.0
    tri[:, H // 4:-H // 4, W // 4:-W // 4] = (0, 1, 0)
    first_tri = jnp.asarray(tri, dtype)

    def steady(bank, frame):
        return eval_frame_step(stm_vars, fba_vars, bank, frame, first_tri,
                               jnp.asarray(False), jnp.asarray(False),
                               jnp.asarray(False), stage=4, max_memory_num=5)

    # one first-frame to seed the bank, then the steady branch
    out = eval_frame_step(stm_vars, fba_vars, bank, frame, first_tri,
                          jnp.asarray(True), jnp.asarray(True),
                          jnp.asarray(False), stage=4, max_memory_num=5)
    bank = out.bank

    lowered = jax.jit(steady).lower(bank, frame)
    compiled = lowered.compile()
    ca = compiled.cost_analysis()
    ca = ca[0] if isinstance(ca, (list, tuple)) else ca
    flops = float(ca.get("flops", 0.0)) if ca else 0.0
    hbm_bytes = float(ca.get("bytes accessed", 0.0)) if ca else 0.0

    out = steady(bank, frame)
    jax.block_until_ready(out.alpha)
    bank = out.bank
    t0 = time.perf_counter()
    for _ in range(args.frames):
        out = steady(bank, frame)
        bank = out.bank
    jax.block_until_ready(out.alpha)
    dt = (time.perf_counter() - t0) / args.frames

    if args.trace:
        with jax.profiler.trace(args.trace):
            for _ in range(5):
                out = steady(bank, frame)
                bank = out.bank
            jax.block_until_ready(out.alpha)
        print(f"trace written to {args.trace}", file=sys.stderr)

    tflops = flops / dt / 1e12 if flops else None
    print(json.dumps(dict(
        res=f"{H}x{W}", batch=B, dtype=DTYPE,
        ms_per_frame=round(dt * 1000, 3),
        fps=round(B / dt, 2),
        xla_flops_per_frame=flops,
        xla_hbm_bytes_per_frame=hbm_bytes,
        achieved_tflops=round(tflops, 2) if tflops else None,
        mfu_pct_v5e=round(100 * flops / dt / V5E_BF16_PEAK, 2) if flops else None,
        hbm_gbps=round(hbm_bytes / dt / 1e9, 1) if hbm_bytes else None,
    )))


if __name__ == "__main__":
    main()
