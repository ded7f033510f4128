"""Loss library parity vs utils/loss_func.py and the FBA loss stack."""
import numpy as np
import pytest

pytestmark = pytest.mark.smoke

jax = pytest.importorskip("jax")
import functools

import jax.numpy as jnp

from otvm_tpu.train import losses as _L


class _Jitted:
    """Call-through to otvm_tpu.train.losses with everything jitted (keyword
    args static): eager per-op dispatch costs ~2 s/op on this image's
    axon-plugin CPU path, jit compiles the whole loss in seconds and the
    persistent cache makes reruns instant (docs/BENCH_NOTES.md smoke note)."""

    def __getattr__(self, name):
        fn = getattr(_L, name)

        def call(*args, **kw):
            return jax.jit(functools.partial(fn, **kw))(*args)

        return call


L = _Jitted()
from tests.torch_ref.refload import load_reference


@pytest.fixture(scope="module")
def ref():
    return load_reference()


def _nchw(x):
    return x.transpose(0, 3, 1, 2)


def _rand(shape, seed=0):
    return np.random.RandomState(seed).rand(*shape).astype(np.float32)


def test_l1_mask(ref):
    import torch
    x, y = _rand((2, 8, 12, 3), 0), _rand((2, 8, 12, 3), 1)
    m = (_rand((2, 8, 12, 1), 2) > 0.5).astype(np.float32)
    for normalize in (True, False):
        t = ref["loss"].L1_mask(torch.from_numpy(_nchw(x)), torch.from_numpy(_nchw(y)),
                                torch.from_numpy(_nchw(m)), normalize=normalize)
        j = L.l1_mask(jnp.asarray(x), jnp.asarray(y), jnp.asarray(m), normalize=normalize)
        np.testing.assert_allclose(float(j), float(t), rtol=1e-5)
        t2 = ref["loss"].L1_mask(torch.from_numpy(_nchw(x)), torch.from_numpy(_nchw(y)),
                                 normalize=normalize)
        j2 = L.l1_mask(jnp.asarray(x), jnp.asarray(y), normalize=normalize)
        np.testing.assert_allclose(float(j2), float(t2), rtol=1e-5)


def test_l1_grad(ref):
    import torch
    x, y = _rand((1, 16, 16, 1), 3), _rand((1, 16, 16, 1), 4)
    t = ref["loss"].L1_grad(torch.from_numpy(_nchw(x)), torch.from_numpy(_nchw(y)))
    j = L.l1_grad(jnp.asarray(x), jnp.asarray(y))
    np.testing.assert_allclose(float(j), float(t), rtol=1e-5)


def test_exclusion_loss(ref):
    import torch
    x, y = _rand((1, 32, 32, 3), 5), _rand((1, 32, 32, 3), 6)
    t = ref["loss"].exclusion_loss(torch.from_numpy(_nchw(x)), torch.from_numpy(_nchw(y)), level=3)
    j = L.exclusion_loss(jnp.asarray(x), jnp.asarray(y), level=3)
    np.testing.assert_allclose(float(j), float(t), rtol=1e-4)


def test_lap_loss(ref):
    import torch
    x, y = _rand((1, 64, 64, 1), 7), _rand((1, 64, 64, 1), 8)
    laploss = ref["loss"].LapLoss()
    t = laploss(torch.from_numpy(_nchw(x)), torch.from_numpy(_nchw(y)))
    j = L.lap_loss(jnp.asarray(x), jnp.asarray(y))
    np.testing.assert_allclose(float(j), float(t), rtol=1e-4)


def test_lap_loss_diff7_matches_unfused():
    """Fused single-pyramid lap loss == per-frame/per-quantity lap_loss sums
    (linearity of the pyramid; see losses.py header comment)."""
    B, S, H, W = 2, 3, 64, 48  # W=48 exercises the /32 padding path
    rng = np.random.RandomState(11)
    r = lambda c, s: rng.rand(B, S, H, W, c).astype(np.float32) + s
    alphas, gta = r(1, 0), r(1, 0)
    Fs, fgs = r(3, 0.1), r(3, 0.2)
    Bs, bgs = r(3, 0.3), r(3, 0.4)

    want = 0.0
    for t in range(S):
        want = want + (
            L.lap_loss(jnp.asarray(alphas[:, t]), jnp.asarray(gta[:, t]))
            + 0.25 * (L.lap_loss(jnp.asarray(Fs[:, t]), jnp.asarray(fgs[:, t]))
                      + L.lap_loss(jnp.asarray(Bs[:, t]), jnp.asarray(bgs[:, t]))))
    want = float(want) / S

    d = np.concatenate([alphas - gta, Fs - fgs, Bs - bgs], axis=-1)
    d = d.reshape(B * S, H, W, 7)
    got = float(L.lap_loss_diff7(jnp.asarray(d), B * S))
    np.testing.assert_allclose(got, want, rtol=1e-5)

    # two stacked heads sum (refinement semantics): diff stacked 2x on batch,
    # same avg_count
    got2 = float(L.lap_loss_diff7(jnp.asarray(np.concatenate([d, d])), B * S))
    np.testing.assert_allclose(got2, 2 * want, rtol=1e-5)


def test_cross_entropy(ref):
    import torch
    logits = np.random.RandomState(0).randn(2, 8, 8, 3).astype(np.float32)
    labels = np.random.RandomState(1).randint(0, 3, (2, 8, 8))
    ce = torch.nn.CrossEntropyLoss()
    t = ce(torch.from_numpy(_nchw(logits)), torch.from_numpy(labels))
    j = L.cross_entropy(jnp.asarray(logits), jnp.asarray(labels))
    np.testing.assert_allclose(float(j), float(t), rtol=1e-5)
    # with ignore_index
    labels2 = labels.copy()
    labels2[0, :4] = 255
    ce2 = torch.nn.CrossEntropyLoss(ignore_index=255)
    t2 = ce2(torch.from_numpy(_nchw(logits)), torch.from_numpy(labels2))
    j2 = L.cross_entropy(jnp.asarray(logits), jnp.asarray(labels2), ignore_label=255)
    np.testing.assert_allclose(float(j2), float(t2), rtol=1e-5)


def test_fba_sequence_loss_against_reference(ref):
    """Full fba_single_image_loss (incl. temporal coherence) vs reference."""
    import torch

    B, S, H, W = 1, 3, 64, 64  # >= 64: reference LapLoss reflect-pads 5 levels
    rng = np.random.RandomState(0)
    preds = rng.rand(B, S, 7, H, W).astype(np.float32)
    trimask = (rng.rand(B, S, 1, H, W) > 0.5).astype(np.float32)
    gts = rng.rand(B, S, 1, H, W).astype(np.float32)
    fgs = rng.rand(B, S, 3, H, W).astype(np.float32)
    bgs = rng.rand(B, S, 3, H, W).astype(np.float32)
    imgs = (fgs * gts + bgs * (1 - gts)).astype(np.float32)

    class Holder(ref["alpha_model"].FullModel):
        def __init__(self):
            torch.nn.Module.__init__(self)
            self.LAPLOSS = ref["loss"].LapLoss()
            self.FBA_LOSS_NORMALIZE = True

    h = Holder()
    t_ac, t_lap, t_grad, *_ = h.fba_single_image_loss(
        *(torch.from_numpy(v) for v in (preds, trimask, gts, fgs, bgs, imgs)),
        0, S, normalize=True)

    def nhwc(x):
        return jnp.asarray(x.transpose(0, 1, 3, 4, 2))

    terms = [L.fba_frame_loss(nhwc(preds)[:, t], nhwc(trimask)[:, t], nhwc(gts)[:, t],
                              nhwc(fgs)[:, t], nhwc(bgs)[:, t], nhwc(imgs)[:, t])
             for t in range(S)]
    j_ac = sum(x[0] for x in terms) / S
    j_grad = sum(x[1] for x in terms) / S
    j_lap = sum(x[2] for x in terms) / S
    alphas = jnp.stack([x[3] for x in terms], 1)
    Fs = jnp.stack([x[5] for x in terms], 1)
    Bs = jnp.stack([x[6] for x in terms], 1)
    j_grad = j_grad + L.temporal_coherence_loss(
        alphas, Fs, Bs, nhwc(gts), nhwc(fgs), nhwc(bgs))

    np.testing.assert_allclose(float(j_ac), float(t_ac), rtol=1e-4)
    np.testing.assert_allclose(float(j_lap), float(t_lap), rtol=1e-4)
    np.testing.assert_allclose(float(j_grad), float(t_grad), rtol=1e-4)

    # fused lap path (what joint_train_forward actually runs) vs torch oracle:
    # diff7 uses the masked compositions cF/cB exactly as the per-frame calls do
    Fs_c = np.stack([np.asarray(x[5]) for x in terms], 1)
    Bs_c = np.stack([np.asarray(x[6]) for x in terms], 1)
    d = np.concatenate([np.asarray(alphas) - gts.transpose(0, 1, 3, 4, 2),
                        Fs_c - fgs.transpose(0, 1, 3, 4, 2),
                        Bs_c - bgs.transpose(0, 1, 3, 4, 2)], axis=-1)
    j_lap_fused = L.lap_loss_diff7(jnp.asarray(d.reshape(B * S, H, W, 7)), B * S)
    np.testing.assert_allclose(float(j_lap_fused), float(t_lap), rtol=1e-4)


def test_argmax_small_matches_jnp_argmax():
    # argmax_small is the padding-friendly unrolled argmax (r4 s4 OOM fix);
    # it must keep jnp.argmax's first-max-wins tie semantics exactly.
    rs = np.random.RandomState(3)
    x = rs.randn(2, 4, 8, 3).astype(np.float32)
    # inject ties: duplicate channels at some pixels
    x[0, :2, :, 1] = x[0, :2, :, 0]
    x[1, 2:, :, 2] = x[1, 2:, :, 1]
    x[0, 3, 0, :] = 0.0  # all-equal pixel -> index 0
    got = np.asarray(L.argmax_small(jnp.asarray(x)))
    want = np.asarray(jnp.argmax(jnp.asarray(x), axis=-1))
    np.testing.assert_array_equal(got, want)
