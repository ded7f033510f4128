"""Long-video stability: 40 frames through one compiled step — bank count
stays capped, no NaN drift, no retraces (the fixed-shape design's whole
point; reference recompiles-by-shape is the anti-pattern, SURVEY §7)."""
import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp

from otvm_tpu.config import get_cfg_defaults
from otvm_tpu.models.otvm import eval_frame_step, make_eval_bank
from otvm_tpu.train.trainer import init_train_state

H, W, N, MAX_MEM, SKIP = 64, 64, 40, 5, 10


def test_long_stream_stability():
    cfg = get_cfg_defaults()
    cfg.train.stage = 4
    state = init_train_state(cfg, jax.random.PRNGKey(0), None, 64, 64)
    stm_vars = {"params": state.params["stm"], "batch_stats": state.batch_stats}
    fba_vars = {"params": state.params["fba"]}

    rng = np.random.RandomState(0)
    frames = [jnp.asarray(rng.rand(1, H, W, 3), jnp.float32) for _ in range(4)]
    tri = np.zeros((1, H, W, 3), np.float32)
    tri[..., 0] = 1
    tri[0, 16:48, 16:48] = (0, 1, 0)
    tri[0, 24:40, 24:40] = (0, 0, 1)

    bank = make_eval_bank(1, H, W, MAX_MEM)
    counts = []
    for i in range(N):
        out = eval_frame_step(
            stm_vars, fba_vars, bank, frames[i % 4], jnp.asarray(tri),
            jnp.asarray(i == 0), jnp.asarray(i % SKIP == 0),
            jnp.asarray(i == N - 1), stage=4, max_memory_num=MAX_MEM)
        bank = out.bank
        counts.append(int(bank.count))
        if i % 10 == 0 or i == N - 1:
            a = np.asarray(out.alpha)
            assert np.isfinite(a).all(), f"NaN/inf alpha at frame {i}"
            assert 0.0 <= a.min() and a.max() <= 1.0

    assert max(counts) <= MAX_MEM
    assert counts[-2] == MAX_MEM  # bank saturated long before the end
    # slot-0 (ground-truth frame) is never evicted: its key row is the
    # frame-0 memory throughout
    assert bool(bank.slot_mask[0, 0])
