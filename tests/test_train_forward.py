"""Golden parity of the full joint TRAINING forward (losses included) vs the
reference alpha FullModel (models/alpha/model.py:189-312) at stage 4 — the
temporal cross-feeding loop, trimap synthesis, FBA loss stack and CE."""
import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp

from otvm_tpu.convert import convert_joint
from otvm_tpu.models.otvm import joint_train_forward
from tests.torch_ref.refload import load_reference, seeded_torch_model

B, S, H, W = 1, 3, 64, 64


@pytest.fixture(scope="module")
def ref():
    return load_reference()


def test_joint_train_forward_stage4(ref):
    import torch

    def build():
        trimap = ref["trimap_model"].FullModel(stage=4, hdim=16)
        return ref["alpha_model"].FullModel(trimap=trimap, stage=4)

    # tame init: the raw trimap logits of untamed random nets saturate and
    # amplify fp32 noise chaotically (see refload.seeded_torch_model)
    tmodel = seeded_torch_model(build, seed=0, tame=True)
    tmodel.train()  # reference trains with frozen BN; our BN is always frozen

    rng = np.random.RandomState(0)
    fg255 = rng.rand(B, S, 3, H, W).astype(np.float32) * 255
    bg255 = rng.rand(B, S, 3, H, W).astype(np.float32) * 255
    alpha = rng.rand(B, S, 1, H, W).astype(np.float32)
    labels = rng.randint(0, 3, (B, S, H, W))
    tri = np.eye(3, dtype=np.float32)[labels].transpose(0, 1, 4, 2, 3)

    with torch.no_grad():
        out = tmodel(torch.from_numpy(alpha), torch.from_numpy(fg255),
                     torch.from_numpy(bg255), ignore_region=None,
                     tri=torch.from_numpy(tri))
    t_losses = [float(x) for x in out[:4]]

    variables = convert_joint(tmodel.state_dict(), stage=4)
    batch = dict(
        fg=jnp.asarray(fg255[:, :, ::-1].transpose(0, 1, 3, 4, 2) / 255.0),
        bg=jnp.asarray(bg255[:, :, ::-1].transpose(0, 1, 3, 4, 2) / 255.0),
        alpha=jnp.asarray(alpha.transpose(0, 1, 3, 4, 2)),
        tri=jnp.asarray(tri.transpose(0, 1, 3, 4, 2)),
    )
    total, aux = joint_train_forward(variables["trimap"], variables["alpha"],
                                     batch, stage=4, exact_edt=True)
    j_losses = [float(aux["L_alpha_comp"]), float(aux["L_lap"]),
                float(aux["L_grad"]), float(aux["L_tri"])]

    for name, jt, tt in zip(("L_alpha_comp", "L_lap", "L_grad", "L_tri"),
                            j_losses, t_losses):
        np.testing.assert_allclose(jt, tt, rtol=2e-3, err_msg=name)
    np.testing.assert_allclose(float(total), sum(t_losses), rtol=2e-3)
