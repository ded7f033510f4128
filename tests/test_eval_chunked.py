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
    """Padded tail frames run under last=True, the only flag combination
    that genuinely skips the bank update in _eval_frame_core (memorize=False
    alone still takes the rolling-replace path) — so the returned bank must
    be (a) INDEPENDENT of the pad frames' pixel content, bit-exactly, and
    (b) still mutated by the real frames in the same chunk.  A padded frame
    that wrote to the bank would corrupt resumable / mid-stream chunking.

    (We deliberately do NOT compare the chunked bank against the per-frame
    stream's bank values: the scan body and the standalone jit fuse
    differently, and through the recurrent alpha->memorize cross-feed a
    ~1e-7 rounding difference amplifies over frames — with random weights
    that drift reaches ~1e-2 under matmul_precision=highest while staying
    semantically equivalent.  test_chunked_matches_per_frame covers the
    per-frame equivalence on outputs; here we pin the exact invariant.)"""
    from otvm_tpu.eval.runner import EvalProtocol, StreamingEvaluator

    cfg = get_cfg_defaults()
    cfg.train.stage = 4
    state = init_train_state(cfg, jax.random.PRNGKey(1), None, H, W)
    stm_vars = {"params": state.params["stm"], "batch_stats": state.batch_stats}
    fba_vars = {"params": state.params["fba"]}

    rng = np.random.RandomState(5)
    frames = rng.rand(4, 1, H, W, 3).astype(np.float32)
    tri = np.zeros((1, H, W, 3), np.float32)
    tri[..., 0] = 1
    tri[0, 8:24, 16:48] = (0, 1, 0)
    tri[0, 12:20, 24:40] = (0, 0, 1)
    first_tri = jnp.asarray(tri)

    # seed the bank with the first (GT) frame
    bank0 = make_eval_bank(1, H, W, MAX_MEM)
    out = eval_frame_step(stm_vars, fba_vars, bank0, jnp.asarray(frames[0]),
                          first_tri, jnp.asarray(True), jnp.asarray(True),
                          jnp.asarray(False), stage=4, max_memory_num=MAX_MEM)
    bank0 = out.bank

    C = 4   # tail chunk: 1 real frame (memorize=True) + 3 pads (last=True)
    fl_first = jnp.asarray([False] * C)
    fl_mem = jnp.asarray([True, False, False, False])
    fl_last = jnp.asarray([False, True, True, True])

    bank0_np = jax.tree_util.tree_map(np.asarray, bank0)

    def run_tail(pad_frame):
        # eval_chunk_step donates the bank buffer — hand it a fresh copy
        bank_in = jax.tree_util.tree_map(jnp.asarray, bank0_np)
        fs = np.concatenate([frames[1:2],
                             np.broadcast_to(pad_frame, (C - 1, 1, H, W, 3))])
        bank, a, t = eval_chunk_step(
            stm_vars, fba_vars, bank_in, jnp.asarray(fs), first_tri,
            fl_first, fl_mem, fl_last, stage=4, max_memory_num=MAX_MEM)
        return bank

    bank_a = run_tail(np.zeros((1, H, W, 3), np.float32))
    bank_b = run_tail(rng.rand(1, H, W, 3).astype(np.float32))

    # (a) pad content never reaches the bank: bit-exact equality
    np.testing.assert_array_equal(np.asarray(bank_a.keys),
                                  np.asarray(bank_b.keys))
    np.testing.assert_array_equal(np.asarray(bank_a.values),
                                  np.asarray(bank_b.values))
    assert int(bank_a.count) == int(bank_b.count)
    # (b) the real memorize=True frame DID mutate the bank
    assert not np.array_equal(np.asarray(bank_a.keys), bank0_np.keys)

    # runner-level: a non-divisible stream yields exactly n outputs and the
    # same bank count as the per-frame protocol
    proto = EvalProtocol(memory_max_num=MAX_MEM, memory_skip_frame=SKIP,
                         chunk=4)
    n = 5
    stream = [rng.rand(H, W, 3).astype(np.float32) for _ in range(n)]
    flags, max_num, _ = proto.flags(n, H, W)
    ev = StreamingEvaluator(stm_vars, fba_vars, proto)
    alphas, trimaps = [], []
    bank = make_eval_bank(1, H, W, max_num)
    bank = ev._run_chunked(bank, stream, jnp.asarray(tri), flags,
                           max_num, (0, 0, 0, 0), stream[0], alphas, trimaps)
    assert len(alphas) == n                      # padded outputs dropped
    bank_ref = make_eval_bank(1, H, W, max_num)
    for i in range(n):
        bank_ref = eval_frame_step(
            stm_vars, fba_vars, bank_ref, jnp.asarray(stream[i][None]),
            jnp.asarray(tri), *(jnp.asarray(f) for f in flags[i]),
            stage=4, max_memory_num=max_num).bank
    assert int(bank.count) == int(bank_ref.count)
