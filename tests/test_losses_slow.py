"""Loss parity cases too compile-heavy for the smoke tier (each distinct
shape is a full 5-level Laplacian-pyramid XLA compile — ~40 s on a 1-core
CPU host)."""
import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp

from otvm_tpu.train import losses as L
from tests.torch_ref.refload import load_reference


def _nchw(x):
    return x.transpose(0, 3, 1, 2)


def _rand(shape, seed=0):
    return np.random.RandomState(seed).rand(*shape).astype(np.float32)


def test_lap_loss_non_mult32():
    """non-/32 size exercises lap_loss's internal padding."""
    import torch
    ref = load_reference()
    laploss = ref["loss"].LapLoss()
    x2, y2 = _rand((1, 40, 56, 3), 9), _rand((1, 40, 56, 3), 10)
    t2 = laploss(torch.from_numpy(_nchw(x2)), torch.from_numpy(_nchw(y2)))
    j2 = L.lap_loss(jnp.asarray(x2), jnp.asarray(y2))
    np.testing.assert_allclose(float(j2), float(t2), rtol=1e-4)
