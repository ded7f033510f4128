"""Host-side trimap synthesis + GT trimap for eval (numpy/cv2).

Ports of:
  * make_trimap_gt (models/alpha/model.py:342-378 / trimap make_trimap,
    models/trimap/model.py:37-54): alpha -> 3-class trimap via unknown-band
    dilation; label rule trimap1 = unknown ? 1 : floor(2*alpha).
  * dataset-side make_trimap (dataset.py:200-229): random-width dilation,
    optional morphological close-first, one-hot output.

The reference synthesizes trimaps with torch max_pool INSIDE Dataset
workers and models; here it is plain cv2.dilate on the host data path (the
in-model eval variant with a FIXED kernel lives here too, called once per
frame by the eval runner before device transfer).
"""
from __future__ import annotations

from typing import Optional, Tuple

import numpy as np


def _dilate(mask: np.ndarray, radius: int) -> np.ndarray:
    if radius <= 0:
        return mask
    import cv2
    kernel = np.ones((2 * radius + 1, 2 * radius + 1), np.uint8)
    return cv2.dilate(mask.astype(np.uint8), kernel).astype(mask.dtype)


def trimap_from_alpha(alpha: np.ndarray, dilate_radius: int, eps: float = 0.0
                      ) -> np.ndarray:
    """alpha [H, W] in [0,1] -> one-hot trimap [H, W, 3] (bg, unknown, fg).

    == make_trimap_gt with a fixed DILATION_KERNEL (the eval protocol path,
    eval.py:67-72 narrow/medium/wide = 5/12/20)."""
    a = alpha.copy()
    if eps > 0:
        a[a < eps] = 0.0
        a[a > 1 - eps] = 1.0
    unknown = ((a > 0) & (a < 1)).astype(np.float32)
    unknown = _dilate(unknown, dilate_radius)
    label = np.where(unknown > 0.5, 1, (2.0 * a).astype(np.int64))
    return np.eye(3, dtype=np.float32)[label]


def random_trimap_from_alpha(rng: np.random.RandomState, alpha: np.ndarray,
                             eps: float = 0.0, max_radius: int = 25,
                             close_first: bool = False,
                             ignore_region: Optional[np.ndarray] = None
                             ) -> np.ndarray:
    """Training-time trimap synthesis with random width (dataset.py:200-229
    and models/trimap/model.py:37-54: kernel radius 0..25 -> width 1..51)."""
    a = alpha.copy()
    if eps > 0:
        a[a < eps] = 0.0
        a[a > 1 - eps] = 1.0
    trimap = ((a > 0) & (a < 1)).astype(np.float32)
    trimap_ori = trimap
    if close_first:
        r = rng.randint(0, 6)  # reference random.Random.randint(0,5) inclusive
        inv = 1.0 - trimap
        if ignore_region is not None:
            inv[ignore_region] = 0
        inv = _dilate(inv, r)
        trimap = 1.0 - inv
        if ignore_region is not None:
            trimap[ignore_region] = 0
        trimap = _dilate(trimap, r)
    radius = rng.randint(0, max_radius + 1)
    trimap = _dilate(trimap, radius)
    if close_first:
        trimap = trimap + trimap_ori
    label = np.where(trimap > 0.5, 1, 2 * (a > 0.5).astype(np.int64))
    if ignore_region is not None:
        label[ignore_region] = 0
    return np.eye(3, dtype=np.float32)[label]


def trimap_from_png(img: np.ndarray) -> np.ndarray:
    """Decode a trimap image -> one-hot [H, W, 3] (dataset.py:878-893).

    2-D (gray {0, 128, 255}): bg = 0, fg = max, unknown = the rest.
    3-D (color): channels >1 mark classes (BGR: ch1 = green = fg?, per the
    reference: bg = neither, fg = ch[...,1], unknown = ch[...,2])."""
    if img.ndim == 2:
        out = np.zeros((*img.shape, 3), np.float32)
        mx = img.max()
        out[..., 0][img == 0] = 1
        out[..., 2][img == mx] = 1
        rest = img.copy()
        rest[img == mx] = 0
        out[..., 1][(rest == rest.max()) & (out[..., 0] == 0) & (out[..., 2] == 0)] = 1
        return out
    t = img > 1
    out = np.zeros((*img.shape[:2], 3), np.float32)
    out[..., 0][~(t[..., 1] | t[..., 2])] = 1
    out[..., 1][t[..., 2]] = 1
    out[..., 2][t[..., 1]] = 1
    return out
