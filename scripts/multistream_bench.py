"""Multi-stream serving benchmark: N concurrent 512p video streams on one
chip through the productized MultiStreamEvaluator (round-robin B=1,
per-stream banks — the measured-best single-chip config, docs/BENCH_NOTES.md).

This is WIRE-INCLUSIVE: every frame pays its uint8 host->device upload
through the runner path, like real serving (and unlike bench.py's
device-resident protocol).  Prints one JSON line.

Env: MS_STREAMS (default 4), MS_RES (512x512), MS_FRAMES (40/stream),
MS_DTYPE (bf16).
"""
from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_STREAMS = int(os.environ.get("MS_STREAMS", "4"))
H, W = (int(x) for x in os.environ.get("MS_RES", "512x512").split("x"))
N_FRAMES = int(os.environ.get("MS_FRAMES", "40"))
DTYPE = os.environ.get("MS_DTYPE", "bf16")


def main():
    import jax

    from otvm_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()

    from otvm_tpu.config import get_cfg_defaults
    from otvm_tpu.eval.runner import EvalProtocol, MultiStreamEvaluator
    from otvm_tpu.train.trainer import init_train_state

    cfg = get_cfg_defaults()
    cfg.train.stage = 4
    state = init_train_state(cfg, jax.random.PRNGKey(0), None, 64, 64)
    stm_vars = {"params": state.params["stm"], "batch_stats": state.batch_stats}
    fba_vars = {"params": state.params["fba"]}

    # wire_u8_out: serving-mode uint8 outputs — on the tunneled chip the
    # f32 alpha+trimap fetch (4 MB/frame) was the whole bottleneck
    proto = EvalProtocol(dtype=DTYPE, wire_u8_out=True)
    ev = MultiStreamEvaluator(stm_vars, fba_vars, proto)

    rng = np.random.RandomState(0)
    tri = np.zeros((H, W, 3), np.float32)
    tri[..., 0] = 1.0
    tri[H // 4:-H // 4, W // 4:-W // 4] = (0, 1, 0)
    tri[3 * H // 8:-3 * H // 8, 3 * W // 8:-3 * W // 8] = (0, 0, 1)

    def mk_video(seed, n):
        r = np.random.RandomState(seed)
        # 4 unique frames cycled: bounds host RAM while still exercising
        # fresh H2D uploads every frame (frames are re-staged per dispatch)
        uniq = [r.rand(H, W, 3).astype(np.float32) for _ in range(4)]
        return dict(frames=[uniq[i % 4] for i in range(n)], first_trimap=tri)

    videos = [mk_video(s, N_FRAMES) for s in range(N_STREAMS)]

    # warmup: compile both branches (first + steady) on a short prefix
    t0 = time.perf_counter()
    ev.run_videos([mk_video(99, 2) for _ in range(N_STREAMS)])
    compile_s = time.perf_counter() - t0

    results, agg_fps = ev.run_videos(videos)
    assert all(len(a) == N_FRAMES for a, _ in results)
    assert all(np.isfinite(a).all() for a, _ in results for a in a)

    print(json.dumps({
        "metric": f"fps_{H}x{W}_{N_STREAMS}streams_wire_joint_s4",
        "value": round(agg_fps, 3),
        "unit": "frames/sec aggregate",
        "per_stream_fps": round(agg_fps / N_STREAMS, 3),
        "streams": N_STREAMS,
        "dtype": DTYPE,
        "wire": "uint8 H2D per frame",
        "compile_s": round(compile_s, 1),
    }))


if __name__ == "__main__":
    main()
