"""Shape/resampling primitives with exact PyTorch-reference semantics.

All tensors are NHWC (TPU-native channels-last). The reference is NCHW
PyTorch; these ops reproduce its numerics bit-for-bit in fp32 where noted:

  * resize_bilinear       == F.interpolate(mode='bilinear', align_corners=False)
                             (reference uses it at models/trimap/STM.py:115,136
                             and models/alpha/FBA/models.py:358-376)
  * adaptive_avg_pool     == nn.AdaptiveAvgPool2d (FBA PPM head,
                             models/alpha/FBA/models.py:300-306)
  * max_pool_3x3_s2       == nn.MaxPool2d(3, 2, 1) (ResNet stems)
  * pad_divide_by         == helpers.py:25-41 / models/alpha/common.py:6-27
  * dilate_mask(r)        == F.max_pool2d(k=2r+1, s=1, p=r) trimap dilation

Everything here is shape-static: index/weight tables are computed with numpy
at trace time, so each (in_size, out_size) pair compiles once and the
gather-based interpolation is O(HWC) — no dense resize matrices.
"""
from __future__ import annotations

import functools
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np


# ---------------------------------------------------------------------------
# bilinear resize (torch align_corners=False semantics)
# ---------------------------------------------------------------------------

@functools.lru_cache(maxsize=None)
def _linear_taps(in_size: int, out_size: int):
    """Source indices and weights for 1-D linear resize, torch semantics.

    src = max(0, (dst + 0.5) * in/out - 0.5); i0 = floor(src); w1 = src - i0;
    i1 = min(i0 + 1, in - 1).  (PyTorch area_pixel_compute_source_index.)
    """
    scale = in_size / out_size
    dst = np.arange(out_size, dtype=np.float64)
    src = np.maximum((dst + 0.5) * scale - 0.5, 0.0)
    i0 = np.floor(src).astype(np.int64)
    i0 = np.minimum(i0, in_size - 1)
    w1 = (src - i0).astype(np.float32)
    i1 = np.minimum(i0 + 1, in_size - 1)
    return i0, i1, w1


def _resize_axis(x: jnp.ndarray, axis: int, out_size: int) -> jnp.ndarray:
    in_size = x.shape[axis]
    if in_size == out_size:
        return x
    i0, i1, w1 = _linear_taps(in_size, out_size)
    w1 = jnp.asarray(w1, dtype=x.dtype)  # keep bf16 paths bf16
    shape = [1] * x.ndim
    shape[axis] = out_size
    w1 = w1.reshape(shape)
    a = jnp.take(x, jnp.asarray(i0), axis=axis)
    b = jnp.take(x, jnp.asarray(i1), axis=axis)
    return a * (1.0 - w1) + b * w1


def resize_bilinear(x: jnp.ndarray, out_hw: Sequence[int]) -> jnp.ndarray:
    """NHWC bilinear resize matching torch align_corners=False."""
    out_h, out_w = out_hw
    x = _resize_axis(x, 1, out_h)
    x = _resize_axis(x, 2, out_w)
    return x


def upsample_x2(x: jnp.ndarray) -> jnp.ndarray:
    return resize_bilinear(x, (x.shape[1] * 2, x.shape[2] * 2))


# ---------------------------------------------------------------------------
# adaptive average pooling (torch AdaptiveAvgPool2d)
# ---------------------------------------------------------------------------

@functools.lru_cache(maxsize=None)
def _adaptive_bounds(in_size: int, out_size: int):
    starts = (np.arange(out_size) * in_size) // out_size
    ends = -((-(np.arange(out_size) + 1) * in_size) // out_size)  # ceil
    return starts, ends


def adaptive_avg_pool(x: jnp.ndarray, out_hw: Sequence[int]) -> jnp.ndarray:
    """NHWC adaptive average pool, exact torch window boundaries."""
    out_h, out_w = out_hw
    n, h, w, c = x.shape
    # pool H via segment means using cumulative sums (exact; windows overlap
    # only at boundaries exactly like torch's floor/ceil rule)
    def pool_axis(v, axis, in_size, out_size):
        starts, ends = _adaptive_bounds(in_size, out_size)
        cs = jnp.cumsum(v, axis=axis)
        zero = jnp.zeros_like(jax.lax.slice_in_dim(cs, 0, 1, axis=axis))
        cs = jnp.concatenate([zero, cs], axis=axis)
        hi = jnp.take(cs, jnp.asarray(ends), axis=axis)
        lo = jnp.take(cs, jnp.asarray(starts), axis=axis)
        cnt = (ends - starts).astype(np.float32)
        shape = [1] * v.ndim
        shape[axis] = out_size
        return (hi - lo) / jnp.asarray(cnt, dtype=v.dtype).reshape(shape)

    x = pool_axis(x, 1, h, out_h)
    x = pool_axis(x, 2, w, out_w)
    return x


# ---------------------------------------------------------------------------
# pooling
# ---------------------------------------------------------------------------

def max_pool_3x3_s2(x: jnp.ndarray) -> jnp.ndarray:
    """nn.MaxPool2d(kernel=3, stride=2, padding=1) on NHWC.

    Init must be -inf (not finfo.min) for reduce_window's max VJP rule."""
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max,
        window_dimensions=(1, 3, 3, 1),
        window_strides=(1, 2, 2, 1),
        padding=((0, 0), (1, 1), (1, 1), (0, 0)),
    )


def avg_pool_2x2(x: jnp.ndarray) -> jnp.ndarray:
    """F.avg_pool2d(kernel=2, stride=2) on NHWC (exclusion loss pyramid)."""
    s = jax.lax.reduce_window(
        x, 0.0, jax.lax.add,
        window_dimensions=(1, 2, 2, 1),
        window_strides=(1, 2, 2, 1),
        padding="VALID",
    )
    return s * 0.25


def dilate_mask(mask: jnp.ndarray, radius: int) -> jnp.ndarray:
    """Binary dilation == F.max_pool2d(k=2r+1, s=1, p=r), NHWC float mask."""
    if radius <= 0:
        return mask
    return jax.lax.reduce_window(
        mask, -jnp.inf, jax.lax.max,
        window_dimensions=(1, 2 * radius + 1, 2 * radius + 1, 1),
        window_strides=(1, 1, 1, 1),
        padding=((0, 0), (radius, radius), (radius, radius), (0, 0)),
    )


# ---------------------------------------------------------------------------
# pad/unpad to a divisor (reference helpers.py:25-41)
# ---------------------------------------------------------------------------

def divide_pad_amounts(h: int, w: int, d: int):
    """(lw, uw, lh, uh) pad so H, W become multiples of d; split-center."""
    new_h = h + (d - h % d) % d
    new_w = w + (d - w % d) % d
    lh, uh = (new_h - h) // 2, (new_h - h) - (new_h - h) // 2
    lw, uw = (new_w - w) // 2, (new_w - w) - (new_w - w) // 2
    return (lw, uw, lh, uh)


def pad_divide_by(x: jnp.ndarray, d: int, value: float = 0.0):
    """Pad NHWC (or NHWC-like, H=axis1 W=axis2) to multiples of d.

    Returns (padded, pad) with pad=(lw, uw, lh, uh), the reference layout.
    """
    h, w = x.shape[1], x.shape[2]
    lw, uw, lh, uh = divide_pad_amounts(h, w, d)
    if lw + uw + lh + uh == 0:
        return x, (0, 0, 0, 0)
    cfg = [(0, 0)] * x.ndim
    cfg[1] = (lh, uh)
    cfg[2] = (lw, uw)
    return jnp.pad(x, cfg, constant_values=value), (lw, uw, lh, uh)


def unpad(x: jnp.ndarray, pad) -> jnp.ndarray:
    lw, uw, lh, uh = pad
    h, w = x.shape[1], x.shape[2]
    return x[:, lh:h - uh if uh else h, lw:w - uw if uw else w]


# ---------------------------------------------------------------------------
# misc
# ---------------------------------------------------------------------------

def reflect_pad_2(x: jnp.ndarray) -> jnp.ndarray:
    """F.pad(..., (2,2,2,2), mode='reflect') on NHWC (LapLoss gaussian)."""
    return jnp.pad(x, ((0, 0), (2, 2), (2, 2), (0, 0)), mode="reflect")


def nchw_to_nhwc(x):
    return jnp.transpose(x, (0, 2, 3, 1))


def nhwc_to_nchw(x):
    return jnp.transpose(x, (0, 3, 1, 2))
