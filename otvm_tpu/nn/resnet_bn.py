"""Dilated ResNet-50-BN FBA encoder variant ('resnet50_BN').

Capability parity with models/alpha/FBA/resnet_bn.py (BasicBlock:14,
Bottleneck:46, ResNet:85, l_resnet50:150) wrapped by ResnetDilatedBN
(models/alpha/FBA/models.py:95-162).  Differences from the GN-WS trunk:

  * 3-conv stem (3x3 s2 -> 64, 3x3 -> 64, 3x3 -> 128), each BatchNorm+ReLU,
    instead of a single 7x7; bottleneck inplanes start at 128;
  * plain convs + BatchNorm2d everywhere (no weight standardization).

BatchNorm is structurally frozen (see BNAffine): the reference trains
with TRAIN.FREEZE_BN putting every BN in eval() (train.py:310-327) and
explicitly disables SyncBN for FBA (train.py:129-132), so running stats are
never updated on the main path — we bake that in.

The dilation surgery (_nostride_dilate, models.py:138-151) and the
conv_out pyramid contract [(input), stem(128, 1/2), l1(256, 1/4),
l2(512, 1/8), l3(1024, 1/8), l4(2048, 1/8)] match the GN-WS wrapper, so
FBADecoder consumes either trunk unchanged.

The reference ships no released checkpoint for this arch (default is
resnet50_GN_WS, models.py:13); it is selectable via Config.alpha.arch for
training from scratch, and the torch converter intentionally rejects it.
"""
from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
from flax import linen as nn

from .layers import Conv
from .ops import max_pool_3x3_s2


class BNAffine(nn.Module):
    """BatchNorm2d as it is actually reachable on this arch: eval-mode
    (FREEZE_BN) with buffers at their init values forever — the reference
    never pretrains resnet50_BN (l_resnet50() without weights,
    resnet_bn.py:150-156) and never updates stats (train.py:310-327) — so
    y = (x - 0) / sqrt(1 + eps) * scale + bias, with scale/bias trainable
    (eval() does not stop affine grads in torch either)."""
    features: int
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x):
        scale = self.param("scale", nn.initializers.ones, (self.features,))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        inv = scale / jnp.sqrt(1.0 + self.eps)
        return (x * inv + bias).astype(x.dtype)


class BottleneckBN(nn.Module):
    planes: int
    stride: int = 1
    downsample: bool = False
    dilation2: int = 1       # dilation of the middle 3x3 conv
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x):
        out_ch = self.planes * 4
        identity = x
        y = Conv(self.planes, 1, 1, 0, use_bias=False, dtype=self.dtype, name="conv1")(x)
        y = BNAffine(self.planes, name="bn1")(y)
        y = nn.relu(y)
        y = Conv(self.planes, 3, self.stride, self.dilation2, dilation=self.dilation2,
                 use_bias=False, dtype=self.dtype, name="conv2")(y)
        y = BNAffine(self.planes, name="bn2")(y)
        y = nn.relu(y)
        y = Conv(out_ch, 1, 1, 0, use_bias=False, dtype=self.dtype, name="conv3")(y)
        y = BNAffine(out_ch, name="bn3")(y)
        if self.downsample:
            identity = Conv(out_ch, 1, self.stride, 0, use_bias=False,
                            dtype=self.dtype, name="downsample_conv")(x)
            identity = BNAffine(out_ch, name="downsample_bn")(identity)
        return nn.relu(y + identity)


class _DilatedLayerBN(nn.Module):
    planes: int
    blocks: int
    first_dilation: int
    rest_dilation: int
    stride: int

    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x):
        x = BottleneckBN(self.planes, self.stride, downsample=True,
                         dilation2=self.first_dilation, dtype=self.dtype, name="0")(x)
        for i in range(1, self.blocks):
            x = BottleneckBN(self.planes, 1, dilation2=self.rest_dilation,
                             dtype=self.dtype, name=str(i))(x)
        return x


class ResNet50DilatedBN(nn.Module):
    """BN FBA encoder trunk: output-stride 8, 11-channel input.

    Returns conv_out = (x_in, stem, l1, l2, l3, l4); strides 1,2,4,8,8,8.
    """
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x):
        conv_out = [x]
        c = Conv(64, 3, 2, 1, use_bias=False, dtype=self.dtype, name="conv1")(x)
        c = BNAffine(64, name="bn1")(c)
        c = nn.relu(c)
        c = Conv(64, 3, 1, 1, use_bias=False, dtype=self.dtype, name="conv2")(c)
        c = BNAffine(64, name="bn2")(c)
        c = nn.relu(c)
        c = Conv(128, 3, 1, 1, use_bias=False, dtype=self.dtype, name="conv3")(c)
        c = BNAffine(128, name="bn3")(c)
        c1 = nn.relu(c)
        conv_out.append(c1)                                    # 1/2, 128
        p = max_pool_3x3_s2(c1)                                # 1/4, 128
        l1 = _DilatedLayerBN(64, 3, 1, 1, 1, dtype=self.dtype, name="layer1")(p)
        conv_out.append(l1)                                    # 1/4, 256
        l2 = _DilatedLayerBN(128, 4, 1, 1, 2, dtype=self.dtype, name="layer2")(l1)
        conv_out.append(l2)                                    # 1/8, 512
        l3 = _DilatedLayerBN(256, 6, 1, 2, 1, dtype=self.dtype, name="layer3")(l2)
        conv_out.append(l3)                                    # 1/8, 1024
        l4 = _DilatedLayerBN(512, 3, 2, 4, 1, dtype=self.dtype, name="layer4")(l3)
        conv_out.append(l4)                                    # 1/8, 2048
        return tuple(conv_out)
