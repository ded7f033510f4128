"""Euclidean distance transform + trimap "click" features, TPU-native.

The reference computes its 6 extra trimap channels (utils/utils.py:25-39) by
shipping every predicted trimap to the CPU for cv2.distanceTransform — a
host sync per frame inside the hot loop.  Here the transform runs on-device:

  * `edt_sq_jfa`   — 1+JFA jump-flooding: O(log n) passes of static-offset
    shifts, fully jittable, VPU-friendly.  Exact for all but a vanishing
    fraction of pixels (error <= a few squared pixels at worst), far inside
    the tolerance of exp(-d^2 / 2 sigma^2) features with sigma >= 6.4 px.
  * `edt_sq_exact` — separable min-plus (1D row scan + column lower
    envelope via broadcast).  Exact, O(H^2 W); used for small inputs and as
    the in-framework oracle.

`trimap_clicks` reproduces utils/utils.py:25-39: for each of the bg/fg
binary masks, d = distance to the nearest mask pixel, features
exp(-d^2 / (2 (s*320)^2)) for s in (0.02, 0.08, 0.16).  A mask with no
on-pixels yields all-zero clicks (the reference's `torch.sum(tk != 0)`
guard), which falls out naturally from d^2 = BIG for seedless images.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

_BIG = jnp.float32(1e12)
_SIGMAS = (0.02 * 320.0, 0.08 * 320.0, 0.16 * 320.0)


@functools.partial(jax.jit, static_argnames=())
def edt_sq_jfa(seeds: jnp.ndarray) -> jnp.ndarray:
    """Squared EDT to the nearest True pixel.  seeds: [H, W] bool -> f32.

    1+JFA expressed as a lax.fori_loop over step sizes with dynamic-shift
    rolls (wrapped entries masked invalid): the traced body is ~50 ops, so
    compile time is flat in image size on every backend — the naive fully
    unrolled shift pyramid made the single-threaded CPU XLA backend take
    tens of minutes.

    The (sy, sx) seed coordinates are packed into ONE int32 code
    (sy * W + sx, -1 = no seed): the loop is HBM-bound on the 8 rolled
    copies per pass, so one rolled array instead of two nearly halves the
    kernel's byte traffic (decode back to (y, x) is cheap VPU ALU)."""
    h, w = seeds.shape
    yy = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0)
    xx = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1)
    code0 = jnp.where(seeds, yy * w + xx, -1)

    def dist2(code):
        cy = code // w
        cx = code - cy * w
        d = (yy - cy).astype(jnp.float32) ** 2 + (xx - cx).astype(jnp.float32) ** 2
        return jnp.where(code >= 0, d, _BIG)

    n = max(int(np.ceil(np.log2(max(h, w, 2)))), 1)
    # step schedule: 1 (pre-pass), 2^(n-1) ... 1, 1 (clean-up)
    ks = jnp.asarray([1] + [1 << (n - 1 - j) for j in range(n)] + [1],
                     dtype=jnp.int32)

    def body(j, code):
        k = ks[j]
        best = dist2(code)
        for sy_sign in (-1, 0, 1):
            for sx_sign in (-1, 0, 1):
                if sy_sign == 0 and sx_sign == 0:
                    continue
                dy, dx = k * sy_sign, k * sx_sign
                c = jnp.roll(code, (dy, dx), axis=(0, 1))
                # entries whose source wrapped around are invalid
                src_y = yy - dy
                src_x = xx - dx
                valid = ((src_y >= 0) & (src_y < h) & (src_x >= 0) & (src_x < w))
                c = jnp.where(valid, c, -1)
                d = dist2(c)
                take = d < best
                best = jnp.where(take, d, best)
                code = jnp.where(take, c, code)
        return code

    code = jax.lax.fori_loop(0, ks.shape[0], body, code0)
    return dist2(code)


def edt_sq_exact(seeds: jnp.ndarray) -> jnp.ndarray:
    """Exact squared EDT (separable min-plus).  seeds: [H, W] bool -> f32.

    Pass 1: per-row 1-D pixel distance to the nearest seed in that row
    (forward/backward scan).  Pass 2: D[y,x] = min_y' (G[y',x]^2 + (y-y')^2)
    by broadcasting over y' (O(H^2 W) — use for H, W <= ~512 or testing).
    """
    h, w = seeds.shape
    big = jnp.float32(1e6)  # 1-D distance cap; squared stays < _BIG

    def row_scan(carry, s):
        d = jnp.where(s, 0.0, carry + 1.0)
        return d, d

    s_t = seeds.T.astype(jnp.bool_)  # scan over W, vector over H
    init = jnp.full((h,), big)
    _, fwd = jax.lax.scan(row_scan, init, s_t)
    _, bwd = jax.lax.scan(row_scan, init, s_t, reverse=True)
    g = jnp.minimum(fwd, bwd).T  # [H, W] 1-D row distances
    g2 = jnp.minimum(g * g, _BIG)

    ys = jnp.arange(h, dtype=jnp.float32)
    dy2 = (ys[:, None] - ys[None, :]) ** 2           # [H, H']
    d = jnp.min(dy2[:, :, None] + g2[None, :, :], axis=1)
    return jnp.minimum(d, _BIG)


def edt_sq(seeds: jnp.ndarray, exact: bool = False) -> jnp.ndarray:
    return edt_sq_exact(seeds) if exact else edt_sq_jfa(seeds)


def trimap_clicks(trimap2: jnp.ndarray, exact: bool = False) -> jnp.ndarray:
    """utils/utils.py:25-39 on NHWC.

    trimap2: [B, H, W, 2] binary (bg mask, fg mask) -> clicks [B, H, W, 6]
    ordered [bg_s1, bg_s2, bg_s3, fg_s1, fg_s2, fg_s3].
    """
    b, h, w, _ = trimap2.shape
    # both seed channels of the whole batch run through ONE jump-flooding
    # loop ([B*2, H, W] via vmap): the loop is latency-bound on its ~90
    # sequential fused kernels, so halving the sequential depth (vs two
    # per-channel EDT calls) matters more than the per-kernel size
    seeds = (jnp.moveaxis(trimap2, -1, 1) > 0.5).reshape(b * 2, h, w)
    d2 = jax.vmap(lambda s: edt_sq(s, exact=exact))(seeds)
    d2 = d2.reshape(b, 2, h, w)
    feats = [jnp.exp(-d2[:, k] / (2.0 * sigma * sigma))
             for k in range(2) for sigma in _SIGMAS]
    return jnp.stack(feats, axis=-1)


def trimap_clicks_host(trimap2: np.ndarray) -> np.ndarray:
    """cv2-exact host-side variant for the data pipeline / test oracle.

    trimap2: [B, H, W, 2] -> [B, H, W, 6], same ordering as trimap_clicks.
    """
    import cv2

    b, h, w, _ = trimap2.shape
    out = np.zeros((b, h, w, 6), np.float32)
    for i in range(b):
        for k in range(2):
            tk = trimap2[i, :, :, k]
            if (tk != 0).sum() == 0:
                continue
            inv = ((1.0 - tk) * 255).astype(np.uint8)
            d = cv2.distanceTransform(inv, cv2.DIST_L2, 0)
            d2 = d.astype(np.float32) ** 2
            for j, sigma in enumerate(_SIGMAS):
                out[i, :, :, 3 * k + j] = np.exp(-d2 / (2.0 * sigma * sigma))
    return out
