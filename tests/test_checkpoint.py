"""Orbax checkpoint round-trip (save/RESUME — the capability the reference
lacks entirely, train.py:127) + the torch-import dispatch."""
import numpy as np
import pytest

pytestmark = pytest.mark.smoke

jax = pytest.importorskip("jax")
import jax.numpy as jnp

from otvm_tpu.train.optim import radam
from otvm_tpu.utils.checkpoint import (restore_train_state, save_pytree,
                                       restore_pytree, save_train_state)


def test_pytree_roundtrip(tmp_path):
    tree = {"a": jnp.arange(6).reshape(2, 3).astype(jnp.float32),
            "b": {"c": jnp.ones(4)}}
    save_pytree(str(tmp_path / "ck"), tree)
    back = restore_pytree(str(tmp_path / "ck"), tree)
    np.testing.assert_array_equal(np.asarray(back["a"]), np.asarray(tree["a"]))
    np.testing.assert_array_equal(np.asarray(back["b"]["c"]), np.asarray(tree["b"]["c"]))


def test_train_state_resume(tmp_path):
    import optax

    from otvm_tpu.train.trainer import TrainState

    params = {"stm": {"w": jnp.ones(3)}, "fba": {"w": jnp.full(2, 2.0)}}
    tx = radam(1e-2)
    state = TrainState(params, {}, tx.init(params), jnp.asarray(7, jnp.int32))
    # advance a few steps so opt_state is non-trivial
    grads = jax.tree_util.tree_map(jnp.ones_like, params)
    for _ in range(3):
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        state = TrainState(optax.apply_updates(state.params, updates),
                           {}, opt_state, state.step + 1)

    save_train_state(str(tmp_path / "st"), state)
    fresh = TrainState(params, {}, tx.init(params), jnp.zeros((), jnp.int32))
    back = restore_train_state(str(tmp_path / "st"), fresh)
    assert int(back.step) == int(state.step)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(np.asarray(a), np.asarray(b)),
        back.params, state.params)
    # resuming continues identically
    u1, _ = tx.update(grads, back.opt_state, back.params)
    u2, _ = tx.update(grads, state.opt_state, state.params)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(np.asarray(a), np.asarray(b)),
        u1, u2)
