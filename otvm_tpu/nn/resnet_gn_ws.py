"""Dilated ResNet-50 with GroupNorm(32) + Weight Standardization (FBA encoder).

Re-expression of the reference FBA encoder (models/alpha/FBA/resnet_GN_WS.py
+ the ResnetDilated wrapper, models/alpha/FBA/models.py:208-269):

  * every conv is weight-standardized (layers_WS.py:13-23)
  * every norm is GroupNorm(32, C) (layers_WS.py:26-27)
  * dilate_scale=8: layer3/layer4 strides removed; _nostride_dilate rule
    (models.py:236-249):
      - the (former) stride-2 3x3 conv of the FIRST block of layer3 gets
        dilation 1, of layer4 gets dilation 2
      - every other 3x3 conv gets dilation 2 (layer3) / 4 (layer4)
      - 1x1 downsample convs just lose their stride
  * conv1 takes 11 channels (3 image + 6 click transform + 2 trimap);
    surgery at models.py:66-85 zero-pads pretrained 3-ch weights.
  * forward returns the conv_out feature pyramid
    [input(11ch), c1(64, 1/2), l1(256, 1/4), l2(512, 1/8), l3(1024, 1/8),
     l4(2048, 1/8)] — matching models.py:251-269.  (MaxPool indices are
    threaded through the reference API but never consumed; dropped here.)
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax.numpy as jnp
from flax import linen as nn

from .layers import GroupNorm32, WSConv
from .ops import max_pool_3x3_s2


class BottleneckGN(nn.Module):
    planes: int
    stride: int = 1
    downsample: bool = False
    dilation2: int = 1       # dilation of the middle 3x3 conv
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x):
        out_ch = self.planes * 4
        identity = x
        y = WSConv(self.planes, 1, 1, 0, use_bias=False, dtype=self.dtype, name="conv1")(x)
        y = GroupNorm32(name="bn1")(y)
        y = nn.relu(y)
        y = WSConv(self.planes, 3, self.stride, self.dilation2, dilation=self.dilation2,
                   use_bias=False, dtype=self.dtype, name="conv2")(y)
        y = GroupNorm32(name="bn2")(y)
        y = nn.relu(y)
        y = WSConv(out_ch, 1, 1, 0, use_bias=False, dtype=self.dtype, name="conv3")(y)
        y = GroupNorm32(name="bn3")(y)
        if self.downsample:
            identity = WSConv(out_ch, 1, self.stride, 0, use_bias=False, dtype=self.dtype,
                              name="downsample_conv")(x)
            identity = GroupNorm32(name="downsample_bn")(identity)
        return nn.relu(y + identity)


class BasicBlockGN(nn.Module):
    """resnet_GN_WS.BasicBlock (used by the FBA RefinementModule)."""
    planes: int
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x):
        y = WSConv(self.planes, 3, 1, 1, use_bias=False, dtype=self.dtype, name="conv1")(x)
        y = GroupNorm32(name="bn1")(y)
        y = nn.relu(y)
        y = WSConv(self.planes, 3, 1, 1, use_bias=False, dtype=self.dtype, name="conv2")(y)
        y = GroupNorm32(name="bn2")(y)
        return nn.relu(y + x)


class _DilatedLayer(nn.Module):
    planes: int
    blocks: int
    first_dilation: int   # middle-conv dilation of block 0
    rest_dilation: int    # middle-conv dilation of blocks 1..
    stride: int           # 1 when dilated, 2 otherwise
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x):
        x = BottleneckGN(self.planes, self.stride, downsample=True,
                         dilation2=self.first_dilation, dtype=self.dtype, name="0")(x)
        for i in range(1, self.blocks):
            x = BottleneckGN(self.planes, 1, dilation2=self.rest_dilation,
                             dtype=self.dtype, name=str(i))(x)
        return x


class ResNet50DilatedGNWS(nn.Module):
    """FBA encoder trunk: output-stride 8, 11-channel input.

    Returns conv_out = (x_in, c1, l1, l2, l3, l4); strides 1,2,4,8,8,8.

    width/blocks: defaults are the real ResNet-50; smaller values build the
    structurally-identical scaled variant for the multichip dryrun (same
    module tree and skip-pyramid contract, fewer channels/blocks).
    """
    dtype: Optional[jnp.dtype] = None
    width: int = 64
    blocks: Sequence[int] = (3, 4, 6, 3)

    @nn.compact
    def __call__(self, x):
        w, b = self.width, self.blocks
        conv_out = [x]
        c = WSConv(w, 7, 2, 3, use_bias=False, dtype=self.dtype, name="conv1")(x)
        c = GroupNorm32(name="bn1")(c)
        c1 = nn.relu(c)
        conv_out.append(c1)                                   # 1/2, 64
        p = max_pool_3x3_s2(c1)                               # 1/4, 64
        l1 = _DilatedLayer(w, b[0], 1, 1, 1, dtype=self.dtype, name="layer1")(p)
        conv_out.append(l1)                                   # 1/4, 256
        l2 = _DilatedLayer(w * 2, b[1], 1, 1, 2, dtype=self.dtype, name="layer2")(l1)
        conv_out.append(l2)                                   # 1/8, 512
        # layer3: stride removed, first-block mid conv dilation 2//2=1, rest 2
        l3 = _DilatedLayer(w * 4, b[2], 1, 2, 1, dtype=self.dtype, name="layer3")(l2)
        conv_out.append(l3)                                   # 1/8, 1024
        # layer4: stride removed, first-block mid conv dilation 4//2=2, rest 4
        l4 = _DilatedLayer(w * 8, b[3], 2, 4, 1, dtype=self.dtype, name="layer4")(l3)
        conv_out.append(l4)                                   # 1/8, 2048
        return tuple(conv_out)
