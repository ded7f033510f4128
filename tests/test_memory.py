"""Memory-bank ring buffer vs the reference eviction policy
(models/alpha/model.py:472-493 / models/trimap/model.py:193-225)."""
import numpy as np
import pytest

pytestmark = pytest.mark.smoke

jax = pytest.importorskip("jax")
import jax.numpy as jnp

from otvm_tpu.models.memory import init_bank, update_bank
from otvm_tpu.models.stm import KEY_DIM, VAL_DIM


def _reference_policy(news, flags, max_memory_num, keep_first=True):
    """Growing-list replica of the reference torch concat logic."""
    mem = []
    for new, (first_frame, memorize) in zip(news, flags):
        if max_memory_num == 0:
            if first_frame:
                mem = [new]
        elif max_memory_num == 1:
            mem = [new]
        else:
            if first_frame:
                mem = [new]
            elif memorize:
                mem = mem + [new]
            else:
                if len(mem) == 1:
                    mem = mem + [new]
                else:
                    mem = mem[:-1] + [new]
            if len(mem) > max_memory_num:
                mem = [mem[0]] + mem[2:] if keep_first else mem[1:]
    return mem


@pytest.mark.parametrize("max_num,skip", [(5, 10), (2, 3), (1, 3), (0, 3), (3, 1)])
def test_bank_policy_matches_reference(max_num, skip):
    hw, B = 4, 1
    n_frames = 14
    rng = np.random.RandomState(0)
    news = [rng.randn(B, hw, KEY_DIM).astype(np.float32) for _ in range(n_frames)]

    flags = []
    for i in range(n_frames):
        memorize = (i % skip == 0) if skip > 2 else False  # eval.py:188-189
        flags.append((i == 0, memorize))

    ref = _reference_policy(news, flags, max_num)

    # one jitted update per policy (eager per-op dispatch costs ~2 s/op on
    # this image's axon-plugin CPU path — docs/BENCH_NOTES.md smoke note)
    import functools
    step = jax.jit(functools.partial(update_bank, max_memory_num=max_num))
    bank = init_bank(B, hw, max_num)
    v = jnp.zeros((B, hw, VAL_DIM))
    for new, (first, mem) in zip(news, flags):
        bank = step(bank, jnp.asarray(new), v, jnp.asarray(first), jnp.asarray(mem))

    count = int(bank.count)
    assert count == len(ref), f"count {count} != ref {len(ref)}"
    got = np.asarray(bank.keys[:, :count])
    want = np.stack(ref, axis=1)
    np.testing.assert_allclose(got, want, atol=0)
    # mask covers exactly the valid slots
    assert bool(bank.slot_mask[:, :count].all())
    assert not bool(bank.slot_mask[:, count:].any())


def test_bank_update_is_jittable_once():
    traces = []

    def traced_update(bank, k, v, first, mem):
        traces.append(1)
        return update_bank(bank, k, v, first, mem, 5)

    fn = jax.jit(traced_update)
    bank = init_bank(1, 4, 5)
    k = jnp.zeros((1, 4, KEY_DIM))
    v = jnp.zeros((1, 4, VAL_DIM))
    for i in range(8):
        bank = fn(bank, k, v, jnp.asarray(i == 0), jnp.asarray(i % 3 == 0))
    assert len(traces) == 1, "bank update retraced — shapes are not fixed"
