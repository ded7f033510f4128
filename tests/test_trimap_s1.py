"""Stage-1 trimap training forward (CE over propagated frames) vs the
reference trimap FullModel._forward (models/trimap/model.py:75-131)."""
import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp

from otvm_tpu.convert import convert_stm
from otvm_tpu.models.otvm import trimap_train_forward
from tests.torch_ref.refload import load_reference, seeded_torch_model

B, S, H, W = 2, 3, 32, 48


@pytest.fixture(scope="module")
def ref():
    return load_reference()


def test_trimap_s1_forward(ref):
    import torch

    tmodel = seeded_torch_model(
        lambda: ref["trimap_model"].FullModel(stage=1, hdim=-1), seed=0)

    rng = np.random.RandomState(0)
    img255 = rng.rand(B, S, 3, H, W).astype(np.float32) * 255
    labels = rng.randint(0, 3, (B, S, H, W))
    tri = np.eye(3, dtype=np.float32)[labels].transpose(0, 1, 4, 2, 3)
    ones = np.ones((B, S, 1, H, W), np.float32)

    # a=1, bg=fg -> scaled_imgs == fg.flip/255 (preprocess, model.py:56-73)
    with torch.no_grad():
        out = tmodel(torch.from_numpy(ones), torch.from_numpy(img255),
                     torch.from_numpy(img255), tri=torch.from_numpy(tri))
    t_loss = float(out[0])
    t_pred = out[2].numpy()

    variables = convert_stm(tmodel.model.state_dict(), hdim=-1)
    batch = dict(
        img=jnp.asarray(img255[:, :, ::-1].transpose(0, 1, 3, 4, 2) / 255.0),
        tri=jnp.asarray(tri.transpose(0, 1, 3, 4, 2)),
    )
    loss, aux = trimap_train_forward(variables, batch)
    np.testing.assert_allclose(float(loss), t_loss, rtol=1e-3)
    np.testing.assert_allclose(
        np.asarray(aux["pred"]).transpose(0, 1, 4, 2, 3), t_pred, atol=2e-3)
