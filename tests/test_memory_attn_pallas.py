"""Pallas flash memory-read kernel vs the XLA einsum path (interpret mode on
CPU; the same kernel compiles for TPU in bench.py)."""
import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp

from otvm_tpu.kernels.memory_attn import memory_read_pallas, memory_read_xla


@pytest.mark.parametrize("hw,t,mask_count", [(64, 2, None), (96, 3, 2), (128, 5, 1)])
def test_flash_matches_xla(hw, t, mask_count):
    rng = np.random.RandomState(0)
    B = 2
    qk = rng.randn(B, hw, 128).astype(np.float32)
    mk = rng.randn(B, t, hw, 128).astype(np.float32)
    mv = rng.randn(B, t, hw, 512).astype(np.float32)
    mask = None
    if mask_count is not None:
        mask = np.zeros((B, t), bool)
        mask[:, :mask_count] = True
        mask = jnp.asarray(mask)

    want = memory_read_xla(jnp.asarray(qk), jnp.asarray(mk), jnp.asarray(mv), mask)
    got = memory_read_pallas(jnp.asarray(qk), jnp.asarray(mk), jnp.asarray(mv), mask,
                             block_q=32, block_kv=64, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5, rtol=1e-4)


def test_flash_custom_vjp_matches_xla_grads(monkeypatch):
    """Gradients through the flash path (custom einsum VJP) == autodiff
    through the XLA path."""
    import otvm_tpu.kernels.memory_attn as MA

    # force the interpret-mode kernel inside the custom-vjp forward
    orig = MA.memory_read_pallas
    monkeypatch.setattr(
        MA, "memory_read_pallas",
        lambda q, k, v, m, **kw: orig(q, k, v, m, block_q=32, block_kv=64,
                                      interpret=True))

    rng = np.random.RandomState(2)
    B, hw, t = 1, 32, 2
    qk = jnp.asarray(rng.randn(B, hw, 128).astype(np.float32))
    mk = jnp.asarray(rng.randn(B, t, hw, 128).astype(np.float32))
    mv = jnp.asarray(rng.randn(B, t, hw, 512).astype(np.float32))
    mask = jnp.asarray(np.array([[True, False]]))

    def loss_flash(q, k, v):
        return jnp.sum(MA._memory_read_flash(q, k, v, mask) ** 2)

    def loss_xla(q, k, v):
        return jnp.sum(MA.memory_read_xla(q, k, v, mask) ** 2)

    gf = jax.grad(loss_flash, argnums=(0, 1, 2))(qk, mk, mv)
    gx = jax.grad(loss_xla, argnums=(0, 1, 2))(qk, mk, mv)
    for a, b in zip(gf, gx):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-3, rtol=1e-3)


def test_flash_uneven_tiles():
    """Q/KV lengths that do not divide the block sizes exercise padding."""
    rng = np.random.RandomState(1)
    B, hw, t = 1, 70, 3
    qk = rng.randn(B, hw, 128).astype(np.float32)
    mk = rng.randn(B, t, hw, 128).astype(np.float32)
    mv = rng.randn(B, t, hw, 512).astype(np.float32)
    want = memory_read_xla(jnp.asarray(qk), jnp.asarray(mk), jnp.asarray(mv))
    got = memory_read_pallas(jnp.asarray(qk), jnp.asarray(mk), jnp.asarray(mv),
                             block_q=32, block_kv=64, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5, rtol=1e-4)
