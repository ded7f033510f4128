"""End-to-end streaming parity: eval_frame_step vs the reference EvalModel
(models/alpha/model.py:391-512) over a multi-frame sequence with the real
memory policy — the closest thing to the reference's demo/dove E2E path,
with random weights and random frames as the oracle fixture."""
import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp

from otvm_tpu.convert import convert_joint
from otvm_tpu.models.memory import init_bank
from otvm_tpu.models.otvm import eval_frame_step, make_eval_bank
from tests.torch_ref.refload import load_reference, seeded_torch_model

H, W = 32, 64  # multiples of 32: no internal padding on either side
N_FRAMES = 6
MAX_MEM = 2
SKIP = 3


@pytest.fixture(scope="module")
def ref():
    return load_reference()


def test_joint_eval_stream(ref):
    import torch

    def build():
        trimap = ref["trimap_model"].FullModel_eval(stage=4, hdim=16, dilate_kernel=12)
        return ref["alpha_model"].EvalModel(dilate_kernel=12, trimap=trimap, stage=4)

    tmodel = seeded_torch_model(build, seed=0)

    rng = np.random.RandomState(7)
    frames01 = rng.rand(N_FRAMES, H, W, 3).astype(np.float32)  # RGB in [0,1]
    tri_label = rng.randint(0, 3, (H, W))
    tri_onehot = np.eye(3, dtype=np.float32)[tri_label]        # [H, W, 3]

    # ---- reference stream (expects BGR*255 video via fg with a == 1)
    t_alphas, t_trimaps = [], []
    with torch.no_grad():
        for i in range(N_FRAMES):
            fg = torch.from_numpy(
                frames01[i][None, None].transpose(0, 1, 4, 2, 3)[:, :, ::-1].copy() * 255.0)
            a = torch.ones(1, 1, 1, H, W)
            tri_gt = torch.from_numpy(tri_onehot[None, None].transpose(0, 1, 4, 2, 3).copy())
            memorize = (i % SKIP == 0)
            out = tmodel(a, fg, fg, tri=None, tri_gt=tri_gt,
                         first_frame=(i == 0), last_frame=(i == N_FRAMES - 1),
                         memorize=memorize, max_memory_num=MAX_MEM,
                         large_input=False)
            _, preds_trimap, _, preds_alpha, _ = out
            t_alphas.append(preds_alpha.squeeze().numpy())
            t_trimaps.append(preds_trimap.squeeze().numpy())

    # ---- my stream
    variables = convert_joint(tmodel.state_dict(), stage=4)
    bank = make_eval_bank(1, H, W, MAX_MEM)
    first_tri = jnp.asarray(tri_onehot[None])
    j_alphas, j_trimaps = [], []
    for i in range(N_FRAMES):
        out = eval_frame_step(
            variables["trimap"], variables["alpha"], bank,
            jnp.asarray(frames01[i][None]), first_tri,
            jnp.asarray(i == 0), jnp.asarray(i % SKIP == 0),
            jnp.asarray(i == N_FRAMES - 1),
            stage=4, max_memory_num=MAX_MEM, exact_edt=True)
        bank = out.bank
        j_alphas.append(np.asarray(out.alpha[0, :, :, 0]))
        j_trimaps.append(np.asarray(out.trimap[0]).transpose(2, 0, 1))

    for i in range(N_FRAMES):
        np.testing.assert_allclose(j_alphas[i], t_alphas[i], atol=2e-3,
                                   err_msg=f"alpha frame {i}")
        np.testing.assert_allclose(j_trimaps[i], t_trimaps[i], atol=2e-3,
                                   err_msg=f"trimap frame {i}")
    # drift check: later frames depend on the whole memory history
    assert int(bank.count) == min(MAX_MEM, N_FRAMES)
