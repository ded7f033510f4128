"""Loss library (NHWC) — exact port of utils/loss_func.py + the FBA loss
stack of models/alpha/model.py:101-187.

All functions take NHWC tensors and reproduce the reference numerics:
  * l1_mask         utils/loss_func.py:4-17   (safe-normalized masked L1)
  * l1_grad         utils/loss_func.py:44-51  (gradient-magnitude L1,
                    eps INSIDE the sqrt)
  * exclusion_loss  utils/loss_func.py:56-82  (multiscale gradient exclusion)
  * lap_loss        utils/loss_func.py:95-173 (5-level Laplacian pyramid with
                    the OpenCV pyrDown kernel, reflect padding, zero-interleave
                    upsample)
  * fba_frame_losses / joint CE  models/alpha/model.py:101-187, 289-296
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..nn.ops import avg_pool_2x2, divide_pad_amounts, reflect_pad_2

EPSILON = 1.001e-5


def l1_mask(x, y, mask=None, normalize=True):
    res = jnp.abs(x - y)
    n, h, w, c = y.shape
    if mask is not None:
        res = res * mask
        if normalize:
            safe = jnp.clip(jnp.sum((mask > EPSILON).astype(jnp.float32)),
                            EPSILON, n * c * h * w + 1)
            return jnp.sum(res) / safe
        return jnp.sum(res)
    return jnp.mean(res) if normalize else jnp.sum(res)


def _gradient(img):
    """dx, dy with trailing zero-pad (utils/loss_func.py:35-42), NHWC."""
    dy = img[:, 1:, :, :] - img[:, :-1, :, :]
    dx = img[:, :, 1:, :] - img[:, :, :-1, :]
    dy = jnp.pad(dy, ((0, 0), (0, 1), (0, 0), (0, 0)))
    dx = jnp.pad(dx, ((0, 0), (0, 0), (0, 1), (0, 0)))
    return dx, dy


def l1_grad(pred, gt, mask=None, normalize=True):
    fx, fy = _gradient(pred)
    tx, ty = _gradient(gt)
    mag_f = jnp.sqrt(fx * fx + fy * fy + EPSILON)
    mag_t = jnp.sqrt(tx * tx + ty * ty + EPSILON)
    return l1_mask(mag_f, mag_t, mask=mask, normalize=normalize)


def exclusion_loss(img1, img2, level=3, normalize=True):
    gradx_loss, grady_loss = [], []
    for _ in range(level):
        gx1, gy1 = _gradient(img1)
        gx2, gy2 = _gradient(img2)
        ax = 2.0 * jnp.mean(jnp.abs(gx1)) / (jnp.mean(jnp.abs(gx2)) + EPSILON)
        ay = 2.0 * jnp.mean(jnp.abs(gy1)) / (jnp.mean(jnp.abs(gy2)) + EPSILON)
        gx1s = jax.nn.sigmoid(gx1) * 2 - 1
        gy1s = jax.nn.sigmoid(gy1) * 2 - 1
        gx2s = jax.nn.sigmoid(gx2 * ax) * 2 - 1
        gy2s = jax.nn.sigmoid(gy2 * ay) * 2 - 1
        safe_x = jnp.mean((gx1s ** 2) * (gx2s ** 2), axis=(1, 2, 3)) + EPSILON
        safe_y = jnp.mean((gy1s ** 2) * (gy2s ** 2), axis=(1, 2, 3)) + EPSILON
        gradx_loss.append(safe_x ** 0.25)
        grady_loss.append(safe_y ** 0.25)
        img1 = avg_pool_2x2(img1)
        img2 = avg_pool_2x2(img2)
    gx = sum(gradx_loss) / float(level)
    gy = sum(grady_loss) / float(level)
    if normalize:
        return jnp.mean(gx) + jnp.mean(gy)
    return jnp.sum(gx) + jnp.sum(gy)


# ---------------------------------------------------------------------------
# Laplacian pyramid loss
# ---------------------------------------------------------------------------

_PYR_KERNEL = (np.array([
    [1., 4., 6., 4., 1.],
    [4., 16., 24., 16., 4.],
    [6., 24., 36., 24., 6.],
    [4., 16., 24., 16., 4.],
    [1., 4., 6., 4., 1.]], np.float32) / 256.0)


def _conv_gauss(img, scale=1.0):
    """Depthwise 5x5 gaussian with reflect pad (loss_func.py:123-126), NHWC."""
    c = img.shape[-1]
    k = jnp.asarray(_PYR_KERNEL * scale)[:, :, None, None]
    k = jnp.tile(k, (1, 1, 1, c))  # HWIO with I=1, groups=C
    img = reflect_pad_2(img)
    return jax.lax.conv_general_dilated(
        img, k, (1, 1), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=c)


def _lap_upsample(x):
    """Zero-interleave x2 then gaussian*4 (loss_func.py:111-121), NHWC."""
    n, h, w, c = x.shape
    up = jnp.zeros((n, h * 2, w * 2, c), x.dtype)
    up = up.at[:, ::2, ::2, :].set(x)
    return _conv_gauss(up, scale=4.0)


def _laplacian_pyramid(img, max_levels=5):
    pyr = []
    current = img
    for _ in range(max_levels):
        filtered = _conv_gauss(current)
        down = filtered[:, ::2, ::2, :]
        up = _lap_upsample(down)
        pyr.append(current - up)
        current = down
    return pyr


def lap_loss(img, tgt, mask=None, normalize=True, max_levels=5):
    """utils/loss_func.py:141-155 (pads to /32 center-split first)."""
    h, w = img.shape[1], img.shape[2]
    lw, uw, lh, uh = divide_pad_amounts(h, w, 32)
    if lw + uw + lh + uh:
        cfg = ((0, 0), (lh, uh), (lw, uw), (0, 0))
        img = jnp.pad(img, cfg)
        tgt = jnp.pad(tgt, cfg)
    pyr_i = _laplacian_pyramid(img, max_levels)
    pyr_t = _laplacian_pyramid(tgt, max_levels)
    loss = sum((2 ** lev) * l1_mask(a, b, mask=mask, normalize=False)
               for lev, (a, b) in enumerate(zip(pyr_i, pyr_t)))
    if normalize:
        n, hh, ww, c = tgt.shape
        safe = (jnp.clip(jnp.sum((mask > 1e-6).astype(jnp.float32)), EPSILON, None)
                if mask is not None else n * c * hh * ww)
        return loss / safe
    return loss


# ---------------------------------------------------------------------------
# Fused Laplacian pyramid loss (round 5)
#
# The r4 bf16 train-step trace (docs/perf_r4/train_trace_top_bf16.txt) showed
# the step's dominant XLA cost to be dozens of 10-34 ms single-channel 5x5
# depthwise gaussian fusions: joint_train_forward ran lap_loss per frame, per
# head, per quantity (alpha/F/B) — ~36 pyramid constructions per step, each
# level a separate 1- or 3-channel conv dispatch whose C-minormost layout
# wastes 127/128 (or 125/128) of the TPU vector lanes.
#
# Two exact algebraic facts collapse all of it into ONE pyramid:
#   1. The Laplacian pyramid is LINEAR in its input (convs, down/upsample and
#      subtraction are linear), so pyr(a)_lev - pyr(b)_lev == pyr(a-b)_lev —
#      only the pyramid of the DIFFERENCE is needed (utils/loss_func.py
#      computes |pyr(a)-pyr(b)| per level; identical up to fp reassociation).
#   2. All (frame, head, quantity) pyramids share the same spatial shape, so
#      the differences stack: alpha/F/B concat to 7 channels, frames x heads
#      concat on batch.  One [N*S*heads, H, W, 7] pyramid — 10 gaussian
#      applications per step instead of ~360 — with per-group abs-sums
#      recovering each original term's normalizer exactly.
#
# The gaussian itself is applied as a SEPARABLE 5-tap shift-multiply-add
# ([1,4,6,4,1]/16 per axis; outer product == the OpenCV pyrDown kernel /256
# exactly) instead of lax.conv: pure slice+elementwise ops fuse into a single
# bandwidth-bound XLA loop with no conv layout copies.
# ---------------------------------------------------------------------------

_GAUSS_TAPS = (1.0 / 16, 4.0 / 16, 6.0 / 16, 4.0 / 16, 1.0 / 16)


def _gauss_sep(x, scale=1.0):
    """Separable 5x5 gaussian, reflect pad 2 — == _conv_gauss up to fp
    reassociation (exact taps: 1/16 and 6/16 products give the /256 kernel)."""
    for axis in (1, 2):
        pad = [(0, 0)] * 4
        pad[axis] = (2, 2)
        xp = jnp.pad(x, pad, mode="reflect")
        n = x.shape[axis]
        x = sum(t * jax.lax.slice_in_dim(xp, i, i + n, axis=axis)
                for i, t in enumerate(_GAUSS_TAPS))
    return x * scale if scale != 1.0 else x


def lap_loss_diff7(diff7, avg_count, max_levels=5):
    """Fused L_lap == L_a_lap + 0.25*(L_F_lap + L_B_lap), summed over the
    stacked leading axis and divided by `avg_count` (= B*S of the original
    per-frame calls; the caller may stack refinement-head diffs too, which the
    reference SUMS across heads, so avg_count stays B*S).

    diff7: [N, H, W, 7] with channels [alpha-gt | F-fg (3) | B-bg (3)];
    N = B*S*heads.  Numerically equals
        sum_t [ lap_loss(alpha_t, gt_t) + 0.25*(lap_loss(F_t, fg_t)
                + lap_loss(B_t, bg_t)) ] / S   (summed over heads)
    up to fp reassociation (linearity of the pyramid, see header comment).
    Matches /root/reference/utils/loss_func.py:141-173 semantics with
    normalize=True and the models/alpha/model.py:160-164 head weighting.
    """
    h, w = diff7.shape[1], diff7.shape[2]
    lw, uw, lh, uh = divide_pad_amounts(h, w, 32)
    if lw + uw + lh + uh:
        diff7 = jnp.pad(diff7, ((0, 0), (lh, uh), (lw, uw), (0, 0)))
    hh, ww = diff7.shape[1], diff7.shape[2]

    s_a = s_f = s_b = jnp.zeros((), diff7.dtype)
    current = diff7
    for lev in range(max_levels):
        filtered = _gauss_sep(current)
        down = filtered[:, ::2, ::2, :]
        n, dh, dw, c = down.shape
        up = jnp.zeros((n, dh * 2, dw * 2, c), down.dtype)
        up = up.at[:, ::2, ::2, :].set(down)
        up = _gauss_sep(up, scale=4.0)
        lap = jnp.abs(current - up)
        w_lev = float(2 ** lev)
        s_a = s_a + w_lev * jnp.sum(lap[..., 0])
        s_f = s_f + w_lev * jnp.sum(lap[..., 1:4])
        s_b = s_b + w_lev * jnp.sum(lap[..., 4:7])
        current = down

    denom = avg_count * hh * ww  # n*c*hh*ww per call, S-average folded in
    return s_a / denom + 0.25 * (s_f + s_b) / (denom * 3.0)


# ---------------------------------------------------------------------------
# FBA per-frame loss stack (models/alpha/model.py:101-187)
# ---------------------------------------------------------------------------

def fba_frame_loss(pred7, trimask, gt_alpha, fg, bg, img, normalize=True,
                   include_lap=True):
    """One frame of fba_single_image_loss.  All NHWC, pred7 [B,H,W,7].

    Returns (L_alpha_comp, L_grad, L_lap, alpha, comp, F, B) — the per-frame
    terms; temporal-coherence is added over the stacked sequence by
    `temporal_coherence_loss`.

    include_lap=False skips the per-frame Laplacian term (returns 0.0 in its
    slot) so the caller can compute it once for the whole sequence via the
    fused `lap_loss_diff7` (the r5 train-step optimization)."""
    alpha = pred7[..., 0:1]
    predF = pred7[..., 1:4]
    predB = pred7[..., 4:7]

    tmask = trimask.astype(jnp.bool_)
    cF = jnp.where(jnp.logical_and(tmask, gt_alpha > 0), predF, fg)
    cB = jnp.where(tmask, predB, bg)

    comp = cF * alpha + cB * (1.0 - alpha)

    L_a1 = l1_mask(alpha, gt_alpha, normalize=normalize)
    ac = cF * gt_alpha + cB * (1.0 - gt_alpha)
    L_ac = l1_mask(ac, img, normalize=normalize)
    FBc = fg * alpha + bg * (1.0 - alpha)
    L_FBc = l1_mask(FBc, img, normalize=normalize)
    L_FB1 = l1_mask(cF, fg, normalize=normalize) + l1_mask(cB, bg, normalize=normalize)
    L_alpha_comp = L_a1 + L_ac + 0.25 * (L_FBc + L_FB1)

    L_ag = l1_grad(alpha, gt_alpha, normalize=normalize)
    L_excl = exclusion_loss(cF, cB, level=3, normalize=normalize)
    L_grad = L_ag + 0.25 * L_excl

    if include_lap:
        L_a_lap = lap_loss(alpha, gt_alpha, normalize=normalize)
        L_F_lap = lap_loss(cF, fg, normalize=normalize)
        L_B_lap = lap_loss(cB, bg, normalize=normalize)
        L_lap = L_a_lap + 0.25 * (L_F_lap + L_B_lap)
    else:
        L_lap = jnp.zeros(())

    return L_alpha_comp, L_grad, L_lap, alpha, comp, cF, cB


def temporal_coherence_loss(alphas, Fs, Bs, gt_alphas, fgs, bgs):
    """models/alpha/model.py:180-185: MSE of adjacent-frame diffs.
    alphas etc: [B, S, H, W, C]."""
    def tc(x, y):
        return jnp.mean(((x[:, 1:] - x[:, :-1]) - (y[:, 1:] - y[:, :-1])) ** 2)

    return tc(alphas, gt_alphas) + 0.25 * (tc(Fs, fgs) + tc(Bs, bgs))


def argmax_small(x):
    """argmax over the last axis, unrolled per channel.

    Numerically identical to jnp.argmax(x, -1) (first max wins ties) but
    padding-friendly on TPU: jnp.argmax over a minor-most axis of size 3
    materializes [..., 3]-minormost iota/reduce temps that the lane tiling
    pads 42-64x (measured: 150 MB for a 2.3 MB s32[2,3,320,320] in the r4
    s4 OOM dump).  Unrolling yields only dense [...] temps."""
    chans = [x[..., k] for k in range(x.shape[-1])]
    best = chans[0]
    idx = jnp.zeros(best.shape, jnp.int32)
    for k in range(1, len(chans)):
        take = chans[k] > best
        best = jnp.where(take, chans[k], best)
        idx = jnp.where(take, k, idx)
    return idx


def cross_entropy(logits, labels, ignore_label: Optional[int] = None):
    """nn.CrossEntropyLoss (mean over non-ignored pixels).
    logits [..., C], labels [...] int.

    Computed with the class axis unrolled rather than via
    log_softmax + take_along_axis: those ops keep [..., C]-minormost
    residuals for the backward pass which the TPU lane tiling pads to
    128, a 42.7x expansion at C=3 (the dominant allocations in the
    round-4 stage-4 OOM).  The unrolled form's residuals are dense
    [...]-shaped planes.  Numerics are the standard stable logsumexp."""
    chans = [logits[..., k] for k in range(logits.shape[-1])]
    m = chans[0]
    for c in chans[1:]:
        m = jnp.maximum(m, c)
    lse = m + jnp.log(sum(jnp.exp(c - m) for c in chans))
    valid = jnp.ones(labels.shape, jnp.float32)
    safe_labels = labels
    if ignore_label is not None:
        valid = (labels != ignore_label).astype(jnp.float32)
        safe_labels = jnp.where(labels == ignore_label, 0, labels)
    picked = chans[-1]
    for k in range(len(chans) - 2, -1, -1):
        picked = jnp.where(safe_labels == k, chans[k], picked)
    ce = lse - picked
    return jnp.sum(ce * valid) / jnp.clip(jnp.sum(valid), 1.0, None)
