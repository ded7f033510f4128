"""Golden-activation parity: FBA alpha network vs the PyTorch reference.

Random-weight reference model -> convert state_dict -> JAX forward must
match within fp32 tolerance (models/alpha/FBA/models.py is the oracle)."""
import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp

from otvm_tpu.convert import convert_fba
from otvm_tpu.models.fba import FBA
from tests.torch_ref.refload import load_reference, seeded_torch_model


@pytest.fixture(scope="module")
def ref():
    return load_reference()


def _run_pair(ref, refinement: bool, seed: int = 0, hw=(32, 48)):
    import torch

    tmodel = seeded_torch_model(lambda: ref["fba"].FBA(refinement=refinement), seed)
    h, w = hw
    rng = np.random.RandomState(seed)
    x = rng.rand(1, 11, h, w).astype(np.float32)
    img = rng.rand(1, 3, h, w).astype(np.float32)
    tt = (rng.rand(1, 2, h, w) > 0.5).astype(np.float32)

    with torch.no_grad():
        t_out, t_hid, t_rout, t_rtri = tmodel(
            torch.from_numpy(x), extras=[torch.from_numpy(img), torch.from_numpy(tt)])

    variables = convert_fba(tmodel.state_dict(), refinement=refinement)
    jmodel = FBA(refinement=refinement)
    j_out, j_hid, j_rout, j_rtri = jmodel.apply(
        {"params": variables["params"]},
        jnp.asarray(x.transpose(0, 2, 3, 1)),
        jnp.asarray(img.transpose(0, 2, 3, 1)),
        jnp.asarray(tt.transpose(0, 2, 3, 1)))

    def cmp(tj, tt_, name, atol=2e-4):
        a = np.asarray(tj).transpose(0, 3, 1, 2)
        b = tt_.numpy()
        np.testing.assert_allclose(a, b, atol=atol, rtol=1e-3, err_msg=name)

    cmp(j_out, t_out, "output")
    cmp(j_hid, t_hid, "hid")
    if refinement:
        cmp(j_rout, t_rout, "refine_output")
        cmp(j_rtri, t_rtri, "refine_trimap")


def test_fba_parity_no_refine(ref):
    _run_pair(ref, refinement=False)


def test_fba_parity_refine(ref):
    _run_pair(ref, refinement=True, seed=1)


def test_fba_fusion_exact(ref):
    import torch

    from otvm_tpu.models.fba import fba_fusion

    rng = np.random.RandomState(0)
    alpha = rng.rand(1, 1, 16, 16).astype(np.float32)
    img = rng.rand(1, 3, 16, 16).astype(np.float32)
    F_ = rng.rand(1, 3, 16, 16).astype(np.float32)
    B_ = rng.rand(1, 3, 16, 16).astype(np.float32)
    ta, tf, tb = ref["fba"].fba_fusion(
        torch.from_numpy(alpha), torch.from_numpy(img),
        torch.from_numpy(F_), torch.from_numpy(B_))
    ja, jf, jb = fba_fusion(
        jnp.asarray(alpha.transpose(0, 2, 3, 1)), jnp.asarray(img.transpose(0, 2, 3, 1)),
        jnp.asarray(F_.transpose(0, 2, 3, 1)), jnp.asarray(B_.transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(np.asarray(ja).transpose(0, 3, 1, 2), ta.numpy(), atol=1e-6)
    np.testing.assert_allclose(np.asarray(jf).transpose(0, 3, 1, 2), tf.numpy(), atol=1e-6)
    np.testing.assert_allclose(np.asarray(jb).transpose(0, 3, 1, 2), tb.numpy(), atol=1e-6)
