"""Core conv/norm primitives (flax.linen, NHWC).

Reference semantics reproduced exactly:
  * WSConv        — weight-standardized conv, layers_WS.py:13-23:
                    w -= mean(w over in,kh,kw); w /= (sqrt(var_unbiased + 1e-12) + 1e-5)
  * GroupNorm32   — nn.GroupNorm(32, C), eps=1e-5 (layers_WS.py:26-27)
  * FrozenBatchNorm — torchvision BatchNorm2d in eval() mode: normalizes with
                    running stats, scale/bias trainable (reference freezes BN
                    during all training: train.py:310-327, FREEZE_BN=True)

Convs are plain linen.Conv with explicit symmetric padding to match torch.
"""
from __future__ import annotations

from typing import Optional, Sequence, Tuple, Union

import jax
import jax.numpy as jnp
from flax import linen as nn


def _pair(v):
    return (v, v) if isinstance(v, int) else tuple(v)


class Conv(nn.Module):
    """torch-style Conv2d on NHWC: explicit symmetric padding, HWIO kernel."""
    features: int
    kernel_size: Union[int, Tuple[int, int]] = 3
    stride: Union[int, Tuple[int, int]] = 1
    padding: Union[int, Tuple[int, int]] = 0
    dilation: Union[int, Tuple[int, int]] = 1
    use_bias: bool = True
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x):
        k = _pair(self.kernel_size)
        p = _pair(self.padding)
        conv = nn.Conv(
            features=self.features,
            kernel_size=k,
            strides=_pair(self.stride),
            padding=[(p[0], p[0]), (p[1], p[1])],
            kernel_dilation=_pair(self.dilation),
            use_bias=self.use_bias,
            dtype=self.dtype,
            name="conv",
        )
        return conv(x)


class WSConv(nn.Module):
    """Weight-standardized Conv2d (FBA layers_WS.Conv2d, layers_WS.py:13-23).

    The kernel is standardized at every forward pass: per-output-channel mean
    subtraction over (kh, kw, in), then division by
    sqrt(var_unbiased + 1e-12) + 1e-5.  torch.var defaults to unbiased (N-1).
    """
    features: int
    kernel_size: Union[int, Tuple[int, int]] = 3
    stride: Union[int, Tuple[int, int]] = 1
    padding: Union[int, Tuple[int, int]] = 0
    dilation: Union[int, Tuple[int, int]] = 1
    use_bias: bool = True
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x):
        k = _pair(self.kernel_size)
        in_ch = x.shape[-1]
        kernel = self.param(
            "kernel", nn.initializers.he_normal(), (k[0], k[1], in_ch, self.features), jnp.float32
        )
        # standardize over (kh, kw, in) per output channel
        w = kernel.astype(jnp.float32)
        mean = jnp.mean(w, axis=(0, 1, 2), keepdims=True)
        w = w - mean
        n = k[0] * k[1] * in_ch
        var = jnp.sum(w * w, axis=(0, 1, 2), keepdims=True) / max(n - 1, 1)
        w = w / (jnp.sqrt(var + 1e-12) + 1e-5)
        # standardization is done in f32 for numerics; the conv itself runs
        # in the module dtype (or the input dtype for bf16 inference paths)
        w = w.astype(self.dtype if self.dtype is not None else x.dtype)
        if self.dtype is not None:
            x = x.astype(self.dtype)
        p = _pair(self.padding)
        y = jax.lax.conv_general_dilated(
            x, w,
            window_strides=_pair(self.stride),
            padding=[(p[0], p[0]), (p[1], p[1])],
            rhs_dilation=_pair(self.dilation),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros, (self.features,), jnp.float32)
            y = y + bias.astype(y.dtype)
        return y


class GroupNorm32(nn.Module):
    """nn.GroupNorm(num_groups=32, C) with torch eps=1e-5.

    num_groups = min(32, C): identical to the reference for every channel
    count the full model produces (all >= 32); the min only engages for the
    width-scaled dryrun model (Config.model_scale > 1)."""
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x):
        groups = min(32, x.shape[-1])
        return nn.GroupNorm(num_groups=groups, epsilon=1e-5, dtype=self.dtype, name="gn")(x)


class FrozenBatchNorm(nn.Module):
    """BatchNorm2d permanently in eval mode.

    y = (x - running_mean) / sqrt(running_var + 1e-5) * scale + bias.
    Running stats live in the 'batch_stats' collection (never updated by
    training — the reference freezes BN everywhere, train.py:310-327);
    scale/bias are trainable params like in torch .eval() mode.
    """
    features: int
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x):
        scale = self.param("scale", nn.initializers.ones, (self.features,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (self.features,), jnp.float32)
        mean = self.variable("batch_stats", "mean", lambda: jnp.zeros((self.features,), jnp.float32))
        var = self.variable("batch_stats", "var", lambda: jnp.ones((self.features,), jnp.float32))
        # fold into a single multiply-add (XLA fuses this into the conv)
        inv = scale / jnp.sqrt(var.value + 1e-5)
        y = x * inv.astype(x.dtype) + (bias - mean.value * inv).astype(x.dtype)
        return y


def leaky_relu(x, negative_slope: float = 0.01):
    """torch nn.LeakyReLU default slope 0.01 (FBA decoder activations)."""
    return jnp.where(x >= 0, x, x * negative_slope)
