"""Per-component timing of the 512p joint eval step (one process).

Times each jitted piece standalone: JFA clicks, STM segment, STM memorize,
FBA forward.  Their sum ~= the full step; directs byte-traffic optimization
(the step is HBM-bound, see BENCH_NOTES).
"""
from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

H, W, B = 512, 512, 1
MAX_MEM = 5


def bench(fn, *args, n=30):
    import jax
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n * 1000.0


def main():
    import jax
    import jax.numpy as jnp

    from otvm_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()

    from otvm_tpu.config import get_cfg_defaults
    from otvm_tpu.models.memory import init_bank
    from otvm_tpu.models.otvm import (_models, eval_frame_step,
                                      make_trimap_features, normalize_image)
    from otvm_tpu.models.stm import STM
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

    stm, fba, _ = _models(4)
    rng = np.random.RandomState(0)
    frame = jnp.asarray(rng.rand(B, H, W, 3), jnp.bfloat16)
    tri = np.zeros((B, H, W, 3), np.float32)
    tri[..., 0] = 1
    tri[:, H // 4:-H // 4, W // 4:-W // 4] = (0, 1, 0)
    tri[:, 3 * H // 8:-3 * H // 8, 3 * W // 8:-3 * W // 8] = (0, 0, 1)
    tri3 = jnp.asarray(tri, jnp.bfloat16)
    bank = init_bank(B, (H // 16) * (W // 16), MAX_MEM, dtype=jnp.bfloat16)

    res = {}

    def rec(key, val):
        res[key] = round(val, 3)
        print(json.dumps({key: res[key]}), flush=True)

    clicks_fn = jax.jit(lambda t3: make_trimap_features(t3, False))
    rec("jfa_clicks_ms", bench(clicks_fn, tri3))

    seg_fn = jax.jit(lambda f, b: stm.apply(stm_vars, f, b.keys, b.values,
                                            b.slot_mask, method=STM.segment))
    rec("stm_segment_ms", bench(seg_fn, frame, bank))

    feats8, _ = clicks_fn(tri3)
    x11 = jnp.concatenate([normalize_image(frame), feats8], axis=-1)
    fba_fn = jax.jit(lambda x, f, t2: fba.apply(fba_vars, x, f, t2))
    rec("fba_forward_ms", bench(fba_fn, x11, frame, feats8[..., -2:]))

    out7, hid, rout7, rtri = fba_fn(x11, frame, feats8[..., -2:])
    alpha = rout7[..., 0]
    mem_fn = jax.jit(lambda f, t3, a, h: stm.apply(
        stm_vars, f, t3[..., 1], t3[..., 2], method=STM.memorize,
        alpha=a, hidden=h))
    rec("stm_memorize_ms", bench(mem_fn, frame, tri3, alpha, hid))

    # full step donates the bank -> rebind each iteration (chain timing)
    def chain(memorize, n=30):
        bk = init_bank(B, (H // 16) * (W // 16), MAX_MEM, dtype=jnp.bfloat16)
        m = jnp.asarray(memorize)
        f = jnp.asarray(False)
        out = eval_frame_step(stm_vars, fba_vars, bk, frame, tri3, f, m, f,
                              stage=4, max_memory_num=MAX_MEM)
        jax.block_until_ready(out.alpha)
        t0 = time.perf_counter()
        for _ in range(n):
            out = eval_frame_step(stm_vars, fba_vars, out.bank, frame, tri3,
                                  f, m, f, stage=4, max_memory_num=MAX_MEM)
        jax.block_until_ready(out.alpha)
        return (time.perf_counter() - t0) / n * 1000.0

    rec("full_step_memorize_ms", chain(True))
    rec("full_step_nomem_ms", chain(False))
    print(json.dumps(res))


if __name__ == "__main__":
    main()
