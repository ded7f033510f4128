"""Training-step throughput probe (reference train config: stage 4, 320px
crops, global batch 4, 3 frames — config.py:27-39) on the current backend.

Prints one JSON line with ms/step, steps/s, and XLA cost-analysis MFU.
"""
from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

V5E_BF16_PEAK = 197e12
V5E_HBM_PEAK = 819e9


def main():
    import jax
    import jax.numpy as jnp

    from otvm_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()

    from otvm_tpu.config import get_cfg_defaults
    from otvm_tpu.train.trainer import init_train_state, make_optimizer, make_train_step

    stage = int(os.environ.get("PROBE_STAGE", "4"))
    size = int(os.environ.get("PROBE_SIZE", "320"))
    B = int(os.environ.get("PROBE_BATCH", "4"))
    S = int(os.environ.get("PROBE_FRAMES", "3"))

    cfg = get_cfg_defaults()
    cfg.train.stage = stage
    cfg.train.frame_num = S
    state = init_train_state(cfg, jax.random.PRNGKey(0), None, size, size)
    tx = make_optimizer(cfg, state.params, iters_per_epoch=100)
    state = state.replace(opt_state=tx.init(state.params))
    train_step = make_train_step(cfg, tx)

    rng = np.random.RandomState(0)
    tri_lab = rng.randint(0, 3, (B, S, size, size))
    batch = dict(
        fg=jnp.asarray(rng.rand(B, S, size, size, 3), jnp.float32),
        bg=jnp.asarray(rng.rand(B, S, size, size, 3), jnp.float32),
        alpha=jnp.asarray(rng.rand(B, S, size, size, 1), jnp.float32),
        tri=jnp.asarray(np.eye(3, dtype=np.float32)[tri_lab]),
    )

    t0 = time.perf_counter()
    state, metrics = train_step(state, batch)
    jax.block_until_ready(metrics["loss"])
    compile_s = time.perf_counter() - t0

    n = 20
    t0 = time.perf_counter()
    for _ in range(n):
        state, metrics = train_step(state, batch)
    jax.block_until_ready(metrics["loss"])
    ms = (time.perf_counter() - t0) / n * 1000.0

    trace_dir = os.environ.get("PROBE_TRACE", "")
    if trace_dir:
        # per-op profile of the TRAIN step (the r2 traces covered eval only;
        # VERDICT r2 #3) — parse with scripts/trace_top_ops.py <dir>
        with jax.profiler.trace(trace_dir):
            for _ in range(3):
                state, metrics = train_step(state, batch)
            jax.block_until_ready(metrics["loss"])

    rec = dict(stage=stage, size=size, batch=B, frames=S,
               ms_per_step=round(ms, 2), steps_per_s=round(1000.0 / ms, 3),
               frames_per_s=round(1000.0 / ms * B * S, 2),
               compile_s=round(compile_s, 1),
               loss=float(metrics["loss"]))
    try:
        lowered = jax.jit(train_step).lower(state, batch)
        cost = lowered.compile().cost_analysis()
        fl = cost.get("flops", 0.0)
        by = cost.get("bytes accessed", 0.0)
        if fl:
            rec["xla_tflops_per_step"] = round(fl / 1e12, 2)
            rec["mfu_pct_v5e"] = round(fl / (ms / 1e3) / V5E_BF16_PEAK * 100, 2)
        if by:
            # cost-analysis "bytes accessed" counts every operand touch,
            # including VMEM-resident re-reads inside fusions — an UPPER
            # bound on real HBM traffic, so this ratio can exceed 100%
            # (observed 129% post-lap-fusion).  Treat as a roofline bound,
            # not a measured DMA counter.
            rec["hbm_util_pct"] = round(by / (ms / 1e3) / V5E_HBM_PEAK * 100, 1)
    except Exception:
        pass
    print(json.dumps(rec))


if __name__ == "__main__":
    main()
