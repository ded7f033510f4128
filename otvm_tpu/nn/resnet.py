"""torchvision-style ResNet-50 trunk with frozen BatchNorm (STM encoders).

The reference STM encoders take torchvision resnet50 layers conv1..layer3
(models/trimap/STM.py:43-51, 79-87) and always run BN in eval mode
(FREEZE_BN, train.py:310-327).  This is the same architecture expressed
NHWC/linen with FrozenBatchNorm.  Param names mirror torchvision
('conv1', 'bn1', 'layer1.0.conv1', ...) to keep the .pth converter a pure
name-mapping exercise.
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax.numpy as jnp
from flax import linen as nn

from .layers import Conv, FrozenBatchNorm
from .ops import max_pool_3x3_s2


def _norm(kind: str, features: int, name: str):
    """Trunk norm factory.

    'frozen_bn' — torchvision BN in eval mode (the reference's FREEZE_BN
    semantics; correct when loading pretrained stats).
    'gn'        — GroupNorm(min(32, C)): the from-scratch recipe.  At random
    init frozen BN is the identity (stats mean=0/var=1), leaving a no-norm
    ResNet-50 that barely learns (round-3 s1t: flat IoU).  flax GroupNorm's
    params are also named scale/bias, so the param-tree keys are identical
    to FrozenBatchNorm's; GN checkpoints simply have no batch_stats, which
    is how eval auto-detects the variant."""
    if kind == "gn":
        return nn.GroupNorm(num_groups=min(32, features), epsilon=1e-5, name=name)
    return FrozenBatchNorm(features, name=name)


class Bottleneck(nn.Module):
    planes: int
    stride: int = 1
    downsample: bool = False
    dtype: Optional[jnp.dtype] = None
    norm: str = "frozen_bn"

    @nn.compact
    def __call__(self, x):
        out_ch = self.planes * 4
        identity = x
        y = Conv(self.planes, 1, 1, 0, use_bias=False, dtype=self.dtype, name="conv1")(x)
        y = _norm(self.norm, self.planes, "bn1")(y)
        y = nn.relu(y)
        y = Conv(self.planes, 3, self.stride, 1, use_bias=False, dtype=self.dtype, name="conv2")(y)
        y = _norm(self.norm, self.planes, "bn2")(y)
        y = nn.relu(y)
        y = Conv(out_ch, 1, 1, 0, use_bias=False, dtype=self.dtype, name="conv3")(y)
        y = _norm(self.norm, out_ch, "bn3")(y)
        if self.downsample:
            identity = Conv(out_ch, 1, self.stride, 0, use_bias=False, dtype=self.dtype,
                            name="downsample_conv")(x)
            identity = _norm(self.norm, out_ch, "downsample_bn")(identity)
        return nn.relu(y + identity)


class ResNetLayer(nn.Module):
    planes: int
    blocks: int
    stride: int
    dtype: Optional[jnp.dtype] = None
    norm: str = "frozen_bn"

    @nn.compact
    def __call__(self, x):
        x = Bottleneck(self.planes, self.stride, downsample=True, dtype=self.dtype,
                       norm=self.norm, name="0")(x)
        for i in range(1, self.blocks):
            x = Bottleneck(self.planes, 1, dtype=self.dtype, norm=self.norm, name=str(i))(x)
        return x


class ResNet50Trunk(nn.Module):
    """conv1..layer3 of ResNet-50: returns (r4, r3, r2, c1).

    Strides: c1 = 1/2 (64ch), r2 = 1/4 (256ch), r3 = 1/8 (512ch),
    r4 = 1/16 (1024ch) — the STM feature pyramid.

    The stem conv is applied by the caller (STM sums extra-mask convs into it,
    STM.py:63-67), so `stem()` and `stages()` are exposed separately.

    width/blocks: defaults are the real ResNet-50; smaller values build the
    structurally-identical width/depth-scaled variant used by the multichip
    dryrun (same module tree, same sharding/collective graph, ~10x less
    compile+compute on the 1-core CPU validation host).
    """
    dtype: Optional[jnp.dtype] = None
    width: int = 64
    blocks: Sequence[int] = (3, 4, 6)
    norm: str = "frozen_bn"          # 'gn' for from-scratch training (see _norm)

    def setup(self):
        w, nk = self.width, self.norm
        self.conv1 = Conv(w, 7, 2, 3, use_bias=False, dtype=self.dtype, name="conv1")
        self.bn1 = _norm(nk, w, "bn1")
        self.layer1 = ResNetLayer(w, self.blocks[0], 1, dtype=self.dtype, norm=nk, name="layer1")
        self.layer2 = ResNetLayer(w * 2, self.blocks[1], 2, dtype=self.dtype, norm=nk, name="layer2")
        self.layer3 = ResNetLayer(w * 4, self.blocks[2], 2, dtype=self.dtype, norm=nk, name="layer3")

    def stem_conv(self, x):
        return self.conv1(x)

    def stages(self, x):
        """x: output of (stem conv + any extra convs), pre-BN."""
        x = self.bn1(x)
        c1 = nn.relu(x)                 # 1/2, 64
        x = max_pool_3x3_s2(c1)         # 1/4, 64
        r2 = self.layer1(x)             # 1/4, 256
        r3 = self.layer2(r2)            # 1/8, 512
        r4 = self.layer3(r3)            # 1/16, 1024
        return r4, r3, r2, c1

    def __call__(self, x):
        return self.stages(self.stem_conv(x))
