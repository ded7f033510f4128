"""RAdam parity vs the reference buffer-variant (utils/optimizer.py:5-94)."""
import numpy as np
import pytest

pytestmark = pytest.mark.smoke

jax = pytest.importorskip("jax")
import jax.numpy as jnp
import optax

from otvm_tpu.train.optim import radam, stair_schedule
from tests.torch_ref.refload import load_reference


@pytest.fixture(scope="module")
def ref():
    return load_reference()


@pytest.mark.parametrize("weight_decay", [0.0, 1e-2])
def test_radam_matches_reference(ref, weight_decay):
    import torch

    rng = np.random.RandomState(0)
    p0 = rng.randn(4, 5).astype(np.float32)
    grads = [rng.randn(4, 5).astype(np.float32) * 0.3 for _ in range(12)]

    # torch reference
    tp = torch.nn.Parameter(torch.from_numpy(p0.copy()))
    opt = ref["optim"].RAdam([tp], lr=1e-2, weight_decay=weight_decay)
    for g in grads:
        tp.grad = torch.from_numpy(g.copy())
        opt.step()

    # mine (one jitted step fn: eager per-op dispatch is ~2 s/op here)
    tx = radam(1e-2, weight_decay=weight_decay)
    params = {"w": jnp.asarray(p0)}
    state = tx.init(params)

    @jax.jit
    def step(params, state, g):
        updates, state = tx.update({"w": g}, state, params)
        return optax.apply_updates(params, updates), state

    for g in grads:
        params, state = step(params, state, jnp.asarray(g))

    # residual f32-vs-f64 rounding in the rectification scalar: <= ~3e-6 abs
    np.testing.assert_allclose(np.asarray(params["w"]), tp.detach().numpy(),
                               atol=1e-5, rtol=1e-4)


def test_radam_no_update_before_rectification():
    """degenerated_to_sgd=False: steps 1-5 leave params unchanged (n_sma
    first reaches 5 at step 6 with beta2=0.999; utils/optimizer.py:75-78)."""
    tx = radam(1e-2, weight_decay=1e-2)
    params = {"w": jnp.ones((3,))}
    state = tx.init(params)

    @jax.jit
    def step(params, state):
        updates, state = tx.update({"w": jnp.ones((3,))}, state, params)
        return optax.apply_updates(params, updates), state

    for i in range(5):
        params, state = step(params, state)
        np.testing.assert_allclose(np.asarray(params["w"]), 1.0, atol=0)
    params, state = step(params, state)
    assert float(jnp.abs(params["w"] - 1.0).max()) > 0  # step 6 updates


def test_stair_schedule():
    sch = stair_schedule(1e-5, 1000)
    assert float(sch(jnp.asarray(1))) == pytest.approx(1e-5)
    assert float(sch(jnp.asarray(900))) == pytest.approx(1e-5)   # progress 0.899
    assert float(sch(jnp.asarray(901))) == pytest.approx(1e-6)   # progress 0.900
