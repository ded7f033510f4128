"""Metric implementations vs the reference utils/tmp/metric.py (torch).

The reference BatchMetric requires CUDA for Gradient/Connectivity filters;
we compare against hand-driven equivalents of its torch code on CPU where
possible and against its pure-tensor methods directly."""
import numpy as np
import pytest

pytestmark = pytest.mark.smoke

from otvm_tpu.eval import metrics as M


def _clip(seed=0, B=4, H=48, W=64):
    rng = np.random.RandomState(seed)
    base = rng.rand(1, H, W) * 255
    drift = np.cumsum(rng.randn(B, H, W) * 5, axis=0)
    target = np.clip(base + drift, 0, 255).astype(np.float32)
    pred = np.clip(target + rng.randn(B, H, W) * 10, 0, 255).astype(np.float32)
    return pred, target


@pytest.fixture(scope="module")
def ref_metric():
    import sys
    import types
    sys.path.insert(0, "/root/reference")
    from tests.torch_ref.refload import load_reference
    load_reference()  # installs torchvision stub + stty patch

    if "skimage" not in sys.modules:  # scipy-backed stand-in for the import
        from scipy import ndimage
        sk = types.ModuleType("skimage")
        meas = types.ModuleType("skimage.measure")

        def label(x, connectivity=1, return_num=False):
            cc, num = ndimage.label(x)
            return (cc, num) if return_num else cc

        meas.label = label
        sk.measure = meas
        sys.modules["skimage"] = sk
        sys.modules["skimage.measure"] = meas

    import importlib
    mod = importlib.import_module("utils.tmp.metric")
    return mod


def test_sad_mse_match_reference(ref_metric):
    import torch

    pred, target = _clip(0)
    mask = ((target > 0) & (target < 255)).astype(np.float32)
    bm = ref_metric.BatchMetric.__new__(ref_metric.BatchMetric)
    t_sad = bm.BatchSAD(torch.from_numpy(pred), torch.from_numpy(target),
                        torch.from_numpy(mask))
    t_mse = bm.BatchMSE(torch.from_numpy(pred), torch.from_numpy(target),
                        torch.from_numpy(mask))
    np.testing.assert_allclose(M.batch_sad(pred, target), t_sad, rtol=1e-5)
    np.testing.assert_allclose(M.batch_mse(pred, target), t_mse, rtol=1e-5)


def test_ssda_dtssd_match_reference(ref_metric):
    import torch

    pred, target = _clip(1)
    mask = ((target > 0) & (target < 255)).astype(np.float32)
    bm = ref_metric.BatchMetric.__new__(ref_metric.BatchMetric)
    for mine, theirs in ((M.ssda, bm.SSDA), (M.dtssd, bm.dtSSD)):
        e, n = mine(pred, target)
        te, tn = theirs(torch.from_numpy(pred), torch.from_numpy(target),
                        torch.from_numpy(mask))
        np.testing.assert_allclose(e, te, rtol=1e-4)
        np.testing.assert_allclose(n, tn, rtol=1e-6)


def test_gradient_matches_torch_conv(ref_metric):
    """Our scipy convolve vs the reference ImageFilter math (flipped kernel
    correlation + replicate padding) on CPU."""
    import torch

    pred, target = _clip(2, B=2)
    mask = ((target > 0) & (target < 255)).astype(np.float32)

    hx, hy = M.gen_gauss_kernel(1.4)
    size = hx.shape[0]

    class F(ref_metric.ImageFilter):
        def __init__(self, w):
            torch.nn.Module.__init__(self)
            self.kernel_size = size
            self.filter = torch.nn.Conv2d(1, 1, size, padding=0, bias=False)
            self.filter.weight = torch.nn.Parameter(torch.from_numpy(w[None, None]))
            self.device = "cpu"

    fx = F(hx[::-1, ::-1].copy())
    fy = F(hy[::-1, ::-1].copy())
    with torch.no_grad():
        p = torch.from_numpy(pred / 255.0)
        t = torch.from_numpy(target / 255.0)
        px, py = fx(p).squeeze(1), fy(p).squeeze(1)
        tx, ty = fx(t).squeeze(1), fy(t).squeeze(1)
        pa = (px ** 2 + py ** 2).sqrt()
        ta = (tx ** 2 + ty ** 2).sqrt()
        want = (((pa - ta) ** 2) * torch.from_numpy(mask)).reshape(2, -1).sum(-1).numpy()

    got = M.batch_gradient(pred, target)
    np.testing.assert_allclose(got, want, rtol=1e-3)


def test_connectivity_and_messddt_run():
    """No CPU-runnable reference for these (CUDA + skimage + mp pools);
    sanity-check invariants instead: zero error on identical inputs."""
    pred, target = _clip(3, B=3)
    same = M.batch_connectivity(target, target)
    np.testing.assert_allclose(same, 0.0, atol=1e-6)
    err, num = M.messddt(target, target)
    np.testing.assert_allclose(err, 0.0, atol=1e-6)
    assert (num > 0).all()
    out = M.video_metrics(pred, target)
    assert set(out) == {"SAD", "MSE", "Grad", "Conn", "SSDA", "dtSSD", "MESSDdt"}
    assert all(np.isfinite(v) for v in out.values())
