"""Golden-activation parity: STM trimap network vs the PyTorch reference
(models/trimap/STM.py with a randomly-initialized stub-torchvision trunk)."""
import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp

from otvm_tpu.convert import convert_stm
from otvm_tpu.models.stm import STM
from tests.torch_ref.refload import load_reference, seeded_torch_model

H, W = 32, 48  # multiples of 16: no internal padding in either impl


@pytest.fixture(scope="module")
def ref():
    return load_reference()


def _make_models(ref, hdim, seed=0):
    tmodel = seeded_torch_model(lambda: ref["stm"].STM(hdim=hdim), seed)
    variables = convert_stm(tmodel.state_dict(), hdim=hdim)
    jmodel = STM(hdim=hdim)
    return tmodel, jmodel, variables


def _memorize_ref(tmodel, frame, masks):
    import torch

    with torch.no_grad():
        k, v = tmodel(torch.from_numpy(frame), torch.from_numpy(masks),
                      torch.tensor([1]))
    # [batch, obj=1, C, 1, H, W] -> [B, HW, C]
    k = k.squeeze(1).squeeze(2).numpy()
    v = v.squeeze(1).squeeze(2).numpy()
    b, c, h, w = k.shape
    return (k.reshape(b, c, h * w).transpose(0, 2, 1),
            v.reshape(b, v.shape[1], h * w).transpose(0, 2, 1))


@pytest.mark.parametrize("hdim", [-1, 16])
def test_stm_memorize_and_segment(ref, hdim):
    import torch

    tmodel, jmodel, variables = _make_models(ref, hdim)
    rng = np.random.RandomState(3)
    frames = rng.rand(3, 1, 3, H, W).astype(np.float32)
    nmask = 4 + hdim if hdim > 0 else 3  # [bg, unknown, fg, (alpha, hid...)]
    masks = rng.rand(3, 1, nmask, H, W).astype(np.float32)

    # --- memorize 2 frames with the reference, collect golden K/V
    ks, vs = [], []
    for t in range(2):
        k, v = _memorize_ref(tmodel, frames[t], masks[t])
        ks.append(k)
        vs.append(v)

    # --- my memorize must match
    for t in range(2):
        fr = jnp.asarray(frames[t].transpose(0, 2, 3, 1))
        kwargs = {}
        if hdim > 0:
            kwargs = dict(alpha=jnp.asarray(masks[t][:, 3]),
                          hidden=jnp.asarray(masks[t][:, 4:].transpose(0, 2, 3, 1)))
        jk, jv = jmodel.apply(variables, fr,
                              jnp.asarray(masks[t][:, 1]),
                              jnp.asarray(masks[t][:, 2]),
                              method=STM.memorize, **kwargs)
        np.testing.assert_allclose(np.asarray(jk), ks[t], atol=2e-4, rtol=1e-3)
        np.testing.assert_allclose(np.asarray(jv), vs[t], atol=2e-4, rtol=1e-3)

    # --- reference segment over the 2-frame memory
    def to_ref_bank(arrs):
        # [B, HW, C] x T -> [B, 1, C, T, H, W]
        out = []
        for a in arrs:
            b, hw, c = a.shape
            out.append(a.transpose(0, 2, 1).reshape(b, 1, c, 1, H // 16, W // 16))
        return torch.from_numpy(np.concatenate(out, axis=3))

    with torch.no_grad():
        t_logit = tmodel(torch.from_numpy(frames[2]), to_ref_bank(ks),
                         to_ref_bank(vs), torch.tensor([1])).numpy()

    mem_k = jnp.asarray(np.stack(ks, axis=1))   # [B, T, HW, Ck]
    mem_v = jnp.asarray(np.stack(vs, axis=1))
    j_logit = jmodel.apply(variables, jnp.asarray(frames[2].transpose(0, 2, 3, 1)),
                           mem_k, mem_v, None, method=STM.segment)
    np.testing.assert_allclose(np.asarray(j_logit).transpose(0, 3, 1, 2),
                               t_logit, atol=5e-4, rtol=1e-3)


def test_memory_read_matches_reference(ref):
    """kernels.memory_attn vs STM.Memory (models/trimap/STM.py:140-163)."""
    import torch

    from otvm_tpu.kernels.memory_attn import memory_read_xla

    rng = np.random.RandomState(0)
    B, T, h, w = 2, 3, 4, 6
    m_in = rng.randn(B, 128, T, h, w).astype(np.float32)
    m_out = rng.randn(B, 512, T, h, w).astype(np.float32)
    q_in = rng.randn(B, 128, h, w).astype(np.float32)
    q_out = rng.randn(B, 512, h, w).astype(np.float32)

    mem = ref["stm"].Memory()
    with torch.no_grad():
        t_res = mem(torch.from_numpy(m_in), torch.from_numpy(m_out),
                    torch.from_numpy(q_in), torch.from_numpy(q_out)).numpy()
    # reference output = cat([readout, q_out]); compare the readout part
    t_read = t_res[:, :512]

    mk = m_in.transpose(0, 2, 3, 4, 1).reshape(B, T, h * w, 128)
    mv = m_out.transpose(0, 2, 3, 4, 1).reshape(B, T, h * w, 512)
    qk = q_in.transpose(0, 2, 3, 1).reshape(B, h * w, 128)
    j_read = memory_read_xla(jnp.asarray(qk), jnp.asarray(mk), jnp.asarray(mv))
    j_read = np.asarray(j_read).reshape(B, h, w, 512).transpose(0, 3, 1, 2)
    np.testing.assert_allclose(j_read, t_read, atol=1e-5, rtol=1e-4)

    # masked read over a padded bank == unmasked read over the valid prefix
    pad_k = np.concatenate([mk, np.zeros_like(mk)], axis=1)
    pad_v = np.concatenate([mv, np.zeros_like(mv)], axis=1)
    mask = np.arange(2 * T)[None, :].repeat(B, 0) < T
    j_masked = memory_read_xla(jnp.asarray(qk), jnp.asarray(pad_k),
                               jnp.asarray(pad_v), jnp.asarray(mask))
    j_masked = np.asarray(j_masked).reshape(B, h, w, 512).transpose(0, 3, 1, 2)
    np.testing.assert_allclose(j_masked, t_read, atol=1e-5, rtol=1e-4)
