"""resnet50_BN FBA encoder variant (C12): selectable via Config.alpha.arch,
forward-correct feature pyramid, usable by the full FBA matting module.
(The reference declares it at models/alpha/FBA/models.py:95-162 but never
selects it and ships no weights — so the contract here is structural, not
numerical parity.)"""
import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp

from otvm_tpu.models.fba import ENCODER_ARCHS
from otvm_tpu.models.otvm import alpha_predict
from otvm_tpu.nn.resnet_bn import ResNet50DilatedBN

H, W = 64, 64


def test_bn_trunk_pyramid():
    trunk = ResNet50DilatedBN()
    x = jnp.asarray(np.random.RandomState(0).rand(1, H, W, 11), jnp.float32)
    v = trunk.init(jax.random.PRNGKey(0), x)
    out = trunk.apply(v, x)
    # (input, stem 1/2, l1 1/4, l2 1/8, l3 1/8, l4 1/8) — os-8 dilation
    chans = [o.shape[-1] for o in out]
    strides = [H // o.shape[1] for o in out]
    assert chans == [11, 128, 256, 512, 1024, 2048]
    assert strides == [1, 2, 4, 8, 8, 8]
    assert all(np.isfinite(np.asarray(o)).all() for o in out)


def test_bn_arch_selectable_in_fba():
    from otvm_tpu.config import get_cfg_defaults
    from otvm_tpu.train.trainer import init_train_state

    cfg = get_cfg_defaults()
    cfg.train.stage = 1
    cfg.alpha.arch = "resnet50_BN"
    state = init_train_state(cfg, jax.random.PRNGKey(0), None, H, W)
    # BN-stem conv1 takes the 11-ch input (models.py:66-85 surgery)
    k = state.params["fba"]["encoder"]["conv1"]["conv"]["kernel"]
    assert k.shape == (3, 3, 11, 64)

    tri = np.zeros((1, H, W, 3), np.float32)
    tri[..., 0] = 1
    tri[0, 16:48, 16:48] = (0, 1, 0)
    frame = jnp.asarray(np.random.RandomState(1).rand(1, H, W, 3), jnp.float32)
    alpha, pred7 = alpha_predict({"params": state.params["fba"]}, frame,
                                 jnp.asarray(tri), stage=1, arch="resnet50_BN")
    a = np.asarray(alpha)
    assert a.shape == (1, H, W, 1) and np.isfinite(a).all()
    assert 0 <= a.min() and a.max() <= 1


def test_unknown_arch_rejected():
    with pytest.raises(KeyError):
        ENCODER_ARCHS["resnet18_GN_WS"]
