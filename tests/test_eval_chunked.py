"""eval_chunk_step (lax.scan over frames, one dispatch per chunk) must
reproduce the per-frame eval_frame_step protocol exactly — same flags, same
bank evolution, same outputs."""
import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp

from otvm_tpu.config import get_cfg_defaults
from otvm_tpu.models.otvm import (eval_chunk_step, eval_frame_step,
                                  make_eval_bank)
from otvm_tpu.train.trainer import init_train_state

H, W = 32, 64
N, SKIP, MAX_MEM = 6, 3, 2


def test_chunked_matches_per_frame():
    cfg = get_cfg_defaults()
    cfg.train.stage = 4
    state = init_train_state(cfg, jax.random.PRNGKey(0), None, H, W)
    stm_vars = {"params": state.params["stm"], "batch_stats": state.batch_stats}
    fba_vars = {"params": state.params["fba"]}

    rng = np.random.RandomState(3)
    frames = rng.rand(N, 1, H, W, 3).astype(np.float32)
    tri = np.zeros((1, H, W, 3), np.float32)
    tri[..., 0] = 1
    tri[0, 8:24, 16:48] = (0, 1, 0)
    tri[0, 12:20, 24:40] = (0, 0, 1)
    first_tri = jnp.asarray(tri)
    flags = [(i == 0, i % SKIP == 0, i == N - 1) for i in range(N)]

    # per-frame
    bank = make_eval_bank(1, H, W, MAX_MEM)
    ref_alphas, ref_tris = [], []
    for i in range(N):
        out = eval_frame_step(stm_vars, fba_vars, bank,
                              jnp.asarray(frames[i]), first_tri,
                              *(jnp.asarray(f) for f in flags[i]),
                              stage=4, max_memory_num=MAX_MEM)
        bank = out.bank
        ref_alphas.append(np.asarray(out.alpha))
        ref_tris.append(np.asarray(out.trimap))
    ref_count = int(bank.count)

    # chunked (2 dispatches of 3)
    bank = make_eval_bank(1, H, W, MAX_MEM)
    got_alphas, got_tris = [], []
    for lo in range(0, N, 3):
        fl = flags[lo:lo + 3]
        bank, a, t = eval_chunk_step(
            stm_vars, fba_vars, bank, jnp.asarray(frames[lo:lo + 3]),
            first_tri,
            jnp.asarray([f[0] for f in fl]), jnp.asarray([f[1] for f in fl]),
            jnp.asarray([f[2] for f in fl]),
            stage=4, max_memory_num=MAX_MEM)
        got_alphas.extend(np.asarray(a))
        got_tris.extend(np.asarray(t))

    assert int(bank.count) == ref_count
    for i in range(N):
        # both [B=1, H, W, C].  atol: the scan body compiles (and fuses)
        # differently from the standalone per-frame jit, so float32 rounding
        # differs at ~1e-4 through the deep resnet — semantic divergence
        # (flag mishandling, bank drift) would show as O(1) differences.
        np.testing.assert_allclose(got_alphas[i], ref_alphas[i], atol=5e-4,
                                   err_msg=f"alpha frame {i}")
        np.testing.assert_allclose(got_tris[i], ref_tris[i], atol=5e-4,
                                   err_msg=f"trimap frame {i}")


def test_chunked_tail_padding_preserves_bank():
    """N not divisible by chunk: the padded tail frames run under last=True,
    which must leave the returned bank IDENTICAL to the per-frame stream's
    (a padded frame that mutates the bank would corrupt resumable streams)."""
    from otvm_tpu.eval.runner import EvalProtocol, StreamingEvaluator

    cfg = get_cfg_defaults()
    cfg.train.stage = 4
    state = init_train_state(cfg, jax.random.PRNGKey(1), None, H, W)
    stm_vars = {"params": state.params["stm"], "batch_stats": state.batch_stats}
    fba_vars = {"params": state.params["fba"]}

    rng = np.random.RandomState(5)
    n = 5                                       # chunk=4 -> tail chunk of 1+3pad
    frames = [rng.rand(H, W, 3).astype(np.float32) for _ in range(n)]
    tri = np.zeros((H, W, 3), np.float32)
    tri[..., 0] = 1
    tri[8:24, 16:48] = (0, 1, 0)
    tri[12:20, 24:40] = (0, 0, 1)

    proto = EvalProtocol(memory_max_num=MAX_MEM, memory_skip_frame=SKIP,
                         chunk=4)
    # per-frame reference bank over the same flags
    flags, max_num, _ = proto.flags(n, H, W)
    bank_ref = make_eval_bank(1, H, W, max_num)
    ref_alphas = []
    for i in range(n):
        out = eval_frame_step(stm_vars, fba_vars, bank_ref,
                              jnp.asarray(frames[i][None]),
                              jnp.asarray(tri[None]),
                              *(jnp.asarray(f) for f in flags[i]),
                              stage=4, max_memory_num=max_num)
        bank_ref = out.bank
        ref_alphas.append(np.asarray(out.alpha[0, :, :, 0]))

    ev = StreamingEvaluator(stm_vars, fba_vars, proto)
    alphas, trimaps = [], []
    bank = make_eval_bank(1, H, W, max_num)
    pad = (0, 0, 0, 0)                           # H,W already /32-padded
    bank = ev._run_chunked(bank, frames, jnp.asarray(tri[None]), flags,
                           max_num, pad, frames[0], alphas, trimaps)

    assert len(alphas) == n                      # padded outputs dropped
    np.testing.assert_allclose(np.asarray(bank.keys),
                               np.asarray(bank_ref.keys), atol=5e-4)
    assert int(bank.count) == int(bank_ref.count)
    for i in range(n):
        np.testing.assert_allclose(alphas[i], ref_alphas[i], atol=5e-4,
                                   err_msg=f"alpha frame {i}")
