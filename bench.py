"""Benchmark: streaming joint (s4) trimap+alpha inference throughput.

Measures frames/sec of the jitted per-frame step at 512p with the reference
eval protocol (memory bank <=5 slots, memorize every 10 frames,
eval.py:178-190) on the default JAX backend (TPU under the driver).

Prints ONE JSON line:
  {"metric": "fps_512p_joint_s4", "value": N, "unit": "frames/sec",
   "vs_baseline": N / 30.0}
vs_baseline is against the BASELINE.json north star (>=30 fps @512p).
"""
from __future__ import annotations

import json
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

H, W = (int(x) for x in os.environ.get("BENCH_RES", "512x512").split("x"))
B = int(os.environ.get("BENCH_BATCH", "1"))  # concurrent video streams
CHUNK = int(os.environ.get("BENCH_CHUNK", "1"))  # frames per dispatch (scan)
N_WARMUP = 3
N_FRAMES = int(os.environ.get("BENCH_FRAMES", "60"))
MAX_MEM = 5
SKIP = 10
BASELINE_FPS = 30.0
DTYPE = os.environ.get("BENCH_DTYPE", "bf16")
# BENCH_WIRE=1: end-to-end serving protocol — every frame pays its uint8
# host->device upload inside the timed loop (the reference's eval.py:157
# streaming loop pays H2D every frame).  Default 0 keeps the headline
# device-resident kernel-throughput protocol.
WIRE = os.environ.get("BENCH_WIRE", "0") == "1"
# BENCH_WIRE_OUT=1: the FULL serving round trip — uint8 upload per frame
# AND a per-frame alpha+trimap fetch (uint8, wire_u8_out=True, pipelined
# one frame deep exactly like eval/runner.py).  This is what a caller of
# `eval.py --wire-u8` observes per frame.  Implies BENCH_WIRE.
WIRE_OUT = os.environ.get("BENCH_WIRE_OUT", "0") == "1"
WIRE = WIRE or WIRE_OUT


def main():
    from otvm_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()

    from otvm_tpu.models.memory import init_bank
    from otvm_tpu.models.otvm import eval_chunk_step, eval_frame_step
    from otvm_tpu.train.trainer import init_train_state
    from otvm_tpu.config import get_cfg_defaults

    cfg = get_cfg_defaults()
    cfg.train.stage = 4
    state = init_train_state(cfg, jax.random.PRNGKey(0), None, 64, 64)

    dtype = jnp.bfloat16 if DTYPE == "bf16" else jnp.float32
    cast = lambda t: jax.tree_util.tree_map(
        lambda x: x.astype(dtype) if x.dtype == jnp.float32 else x, t)
    stm_vars = cast({"params": state.params["stm"], "batch_stats": state.batch_stats})
    fba_vars = cast({"params": state.params["fba"]})

    bank = init_bank(B, (H // 16) * (W // 16), MAX_MEM, dtype=dtype)
    rng = np.random.RandomState(0)
    if WIRE:
        # host-resident uint8 frames; each dispatch below pays the H2D
        frames_u8 = [(rng.rand(B, H, W, 3) * 255).astype(np.uint8)
                     for _ in range(4)]
        frames = [jnp.asarray(f) for f in frames_u8]  # warmup only
    else:
        frames = [jnp.asarray(rng.rand(B, H, W, 3), dtype) for _ in range(4)]
    tri = np.zeros((B, H, W, 3), np.float32)
    tri[..., 0] = 1.0
    tri[:, H // 4:-H // 4, W // 4:-W // 4, 0] = 0.0
    tri[:, H // 4:-H // 4, W // 4:-W // 4, 1] = 1.0
    tri[:, 3 * H // 8:-3 * H // 8, 3 * W // 8:-3 * W // 8, 1] = 0.0
    tri[:, 3 * H // 8:-3 * H // 8, 3 * W // 8:-3 * W // 8, 2] = 1.0
    first_tri = jnp.asarray(tri, dtype)

    def step(bank, frame, first, mem, last):
        return eval_frame_step(stm_vars, fba_vars, bank, frame, first_tri,
                               first, mem, last, stage=4, max_memory_num=MAX_MEM,
                               wire_u8_out=WIRE_OUT)

    # boolean flags staged ONCE: each jnp.asarray(bool) is a device_put, and
    # on a tunneled chip that is one RPC of latency per flag per frame
    T, F = jnp.asarray(True), jnp.asarray(False)

    # warmup / compile (first frame + steady-state branch)
    out = step(bank, frames[0], T, F, F)
    for i in range(1, N_WARMUP):
        out = step(out.bank, frames[i % len(frames)], F,
                   (T if i % SKIP == 0 else F), F)
    jax.block_until_ready(out.alpha)
    assert bool(jnp.isfinite(out.alpha.astype(jnp.float32)).all()), "non-finite alpha"
    bank = out.bank

    if CHUNK > 1:
        # chunked dispatch: same per-frame protocol, scanned on-device
        chunk_frames = jnp.stack([frames[i % len(frames)] for i in range(CHUNK)])
        false = jnp.zeros((CHUNK,), bool)

        # memorize flags from the GLOBAL frame index (chunk_start + i), as
        # the real runner does — deriving them from the within-chunk index
        # would append to the bank every CHUNK frames instead of every SKIP
        def mem_flags(start):
            return jnp.asarray([((start + i) % SKIP) == 0 for i in range(CHUNK)])

        bank, a, _ = eval_chunk_step(stm_vars, fba_vars, bank, chunk_frames,
                                     first_tri, false, mem_flags(0), false,
                                     stage=4, max_memory_num=MAX_MEM)
        jax.block_until_ready(a)
        n_chunks = max(N_FRAMES // CHUNK, 1)
        t0 = time.perf_counter()
        for c in range(n_chunks):
            bank, a, _ = eval_chunk_step(stm_vars, fba_vars, bank, chunk_frames,
                                         first_tri, false, mem_flags(c * CHUNK),
                                         false,
                                         stage=4, max_memory_num=MAX_MEM)
        jax.block_until_ready(a)
        dt = time.perf_counter() - t0
        fps = n_chunks * CHUNK * B / dt
    else:
        pending = None
        t0 = time.perf_counter()
        for i in range(N_FRAMES):
            f = (jnp.asarray(frames_u8[i % 4]) if WIRE
                 else frames[i % len(frames)])
            out = step(bank, f, F, (T if i % SKIP == 0 else F), F)
            bank = out.bank
            if WIRE_OUT:
                # same 1-frame-deep software pipeline as the runner: start
                # this dispatch's D2H now, read the previous one's results
                for a in (out.alpha, out.trimap):
                    fn = getattr(a, "copy_to_host_async", None)
                    if fn is not None:
                        fn()
                if pending is not None:
                    np.asarray(pending.alpha), np.asarray(pending.trimap)
                pending = out
        if pending is not None:
            np.asarray(pending.alpha), np.asarray(pending.trimap)
        jax.block_until_ready(out.alpha)
        dt = time.perf_counter() - t0
        fps = N_FRAMES * B / dt

    metric = ("fps_512p_joint_s4" if (H, W) == (512, 512) and B == 1 and CHUNK == 1
              else f"fps_{H}x{W}_b{B}_c{CHUNK}_joint_s4")
    if WIRE_OUT:
        metric += "_wireio"   # u8 upload + u8 per-frame output fetch
    elif WIRE:
        metric += "_wire"
    print(json.dumps({
        "metric": metric,
        "value": round(fps, 3),
        "unit": "frames/sec",
        "vs_baseline": round(fps / BASELINE_FPS, 4),
    }))


if __name__ == "__main__":
    main()
