"""One-process perf sweep of the streaming joint s4 step.

The axon TPU tunnel takes minutes to become responsive per process, so all
configs run in a single process.  Prints one JSON line per config with fps,
ms/frame, and XLA's own cost-analysis numbers (FLOPs, HBM bytes -> MFU and
bandwidth utilization).

Usage: python scripts/perf_sweep.py [--configs 512c1,512c8,512c16,hd_c1,hd_c4,512b4]
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

V5E_BF16_PEAK = 197e12
V5E_HBM_PEAK = 819e9

CONFIGS = {
    "512c1": dict(h=512, w=512, b=1, chunk=1),
    "512c8": dict(h=512, w=512, b=1, chunk=8),
    "512c16": dict(h=512, w=512, b=1, chunk=16),
    "hd_c1": dict(h=1088, w=1920, b=1, chunk=1),
    "hd_c4": dict(h=1088, w=1920, b=1, chunk=4),
    "hd_c8": dict(h=1088, w=1920, b=1, chunk=8),
    "512b4": dict(h=512, w=512, b=4, chunk=1),
    "512b4c8": dict(h=512, w=512, b=4, chunk=8),
}


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--configs", default="512c1,512c8,512c16,hd_c1,hd_c4,512b4")
    p.add_argument("--frames", type=int, default=48)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from otvm_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()

    from otvm_tpu.config import get_cfg_defaults
    from otvm_tpu.models.memory import init_bank
    from otvm_tpu.models.otvm import eval_chunk_step, eval_frame_step
    from otvm_tpu.train.trainer import init_train_state

    cfg = get_cfg_defaults()
    cfg.train.stage = 4
    state = init_train_state(cfg, jax.random.PRNGKey(0), None, 64, 64)
    cast = lambda t: jax.tree_util.tree_map(
        lambda x: x.astype(jnp.bfloat16) if x.dtype == jnp.float32 else x, t)
    stm_vars = cast({"params": state.params["stm"],
                     "batch_stats": state.batch_stats})
    fba_vars = cast({"params": state.params["fba"]})
    del state

    MAX_MEM, SKIP = 5, 10

    for name in args.configs.split(","):
        c = CONFIGS[name]
        h, w, b, chunk = c["h"], c["w"], c["b"], c["chunk"]
        bank = init_bank(b, (h // 16) * (w // 16), MAX_MEM, dtype=jnp.bfloat16)
        rng = np.random.RandomState(0)
        frame = jnp.asarray(rng.rand(b, h, w, 3), jnp.bfloat16)
        tri = np.zeros((b, h, w, 3), np.float32)
        tri[..., 0] = 1.0
        tri[:, h // 4:-h // 4, w // 4:-w // 4] = (0, 1, 0)
        tri[:, 3 * h // 8:-3 * h // 8, 3 * w // 8:-3 * w // 8] = (0, 0, 1)
        first_tri = jnp.asarray(tri, jnp.bfloat16)

        t_compile = time.perf_counter()
        # first frame (bank seeding) once, outside timing
        out = eval_frame_step(stm_vars, fba_vars, bank, frame, first_tri,
                              jnp.asarray(True), jnp.asarray(False),
                              jnp.asarray(False), stage=4,
                              max_memory_num=MAX_MEM)
        jax.block_until_ready(out.alpha)
        bank = out.bank

        cost = None
        if chunk == 1:
            def step(bk, mem):
                return eval_frame_step(stm_vars, fba_vars, bk, frame,
                                       first_tri, jnp.asarray(False),
                                       jnp.asarray(mem), jnp.asarray(False),
                                       stage=4, max_memory_num=MAX_MEM)
            out = step(bank, True)   # steady-state compile
            jax.block_until_ready(out.alpha)
            compile_s = time.perf_counter() - t_compile
            bank = out.bank
            t0 = time.perf_counter()
            for i in range(args.frames):
                out = step(bank, (i % SKIP) == 0)
                bank = out.bank
            jax.block_until_ready(out.alpha)
            dt = time.perf_counter() - t0
            n = args.frames
            try:
                lowered = jax.jit(
                    lambda bk: eval_frame_step(
                        stm_vars, fba_vars, bk, frame, first_tri,
                        jnp.asarray(False), jnp.asarray(True),
                        jnp.asarray(False), stage=4,
                        max_memory_num=MAX_MEM)).lower(bank)
                cost = lowered.compile().cost_analysis()
            except Exception:
                cost = None
        else:
            frames_c = jnp.broadcast_to(frame, (chunk,) + frame.shape)
            false = jnp.zeros((chunk,), bool)
            mems = jnp.asarray([(i % SKIP) == 0 for i in range(chunk)])
            bank, a, _ = eval_chunk_step(stm_vars, fba_vars, bank, frames_c,
                                         first_tri, false, mems, false,
                                         stage=4, max_memory_num=MAX_MEM)
            jax.block_until_ready(a)
            compile_s = time.perf_counter() - t_compile
            n_chunks = max(args.frames // chunk, 1)
            t0 = time.perf_counter()
            for _ in range(n_chunks):
                bank, a, _ = eval_chunk_step(stm_vars, fba_vars, bank,
                                             frames_c, first_tri, false, mems,
                                             false, stage=4,
                                             max_memory_num=MAX_MEM)
            jax.block_until_ready(a)
            dt = time.perf_counter() - t0
            n = n_chunks * chunk

        fps = n * b / dt
        rec = dict(config=name, res=f"{h}x{w}", batch=b, chunk=chunk,
                   fps=round(fps, 2), ms_per_frame=round(dt / n * 1000, 3),
                   compile_s=round(compile_s, 1))
        if cost:
            fl = cost.get("flops", 0.0)
            by = cost.get("bytes accessed", 0.0)
            if fl:
                rec["xla_gflops_per_frame"] = round(fl / 1e9, 1)
                rec["mfu_pct_v5e"] = round(fl * fps / b / V5E_BF16_PEAK * 100, 2)
            if by:
                rec["hbm_gbps"] = round(by * fps / b / 1e9, 1)
                rec["hbm_util_pct"] = round(by * fps / b / V5E_HBM_PEAK * 100, 1)
        print(json.dumps(rec), flush=True)


if __name__ == "__main__":
    main()
