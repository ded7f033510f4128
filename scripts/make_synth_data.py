"""Generate a synthetic DIM + VideoMatting108 directory tree for training
without the real datasets (the VM108 / Adobe data is not in this image).

Round-3 rewrite: the round-2 fixture (2 noise videos with circle alphas)
produced a degenerate model (all-zero alpha on demo/dove).  This version
generates O(100) diverse clips whose statistics are chosen to make the
*matting capability* transfer:

  * foreground shapes: soft-thresholded metaball fields, superellipses and
    star polygons, with feathered edges of varying width, optional holes and
    hair-like filament strokes (the alpha structure FBA must learn);
  * foreground textures: smooth value-noise colorizations, gradients, and
    near-solid shaded colors over the full hue/brightness range (dove is a
    white bird — white-on-gray cases are in-distribution);
  * backgrounds: low-frequency value-noise textures / gradients / blurred
    mosaics with a panning window (global motion);
  * motion: the canonical fg texture+alpha is warped per frame by a smooth
    random affine trajectory (translation/rotation/scale random walk), so
    frames are temporally coherent like real footage — what STM's memory
    read needs to learn propagation.

Layout parity: dataset.py:232-271 (VideoMatting108: FG_done RGBA with alpha
in the 4th channel, BG_done2, frame_corr.json, {train,val}_videos.txt) and
dataset.py:584-651 (Combined_Dataset DIM layout).

Usage: python scripts/make_synth_data.py /tmp/synth_data \
           [--n-train 112] [--n-val 8] [--frames 28] [--dim-fg 100]
"""
from __future__ import annotations

import argparse
import json
import os

import cv2
import numpy as np

# Canonical video frame size.  Must comfortably exceed the 320 train crop:
# the object-centric crop heuristic (dataset.py:318-357) samples crop centers
# in a [H-320, W-320] window around the frame middle and requires the center
# pixel to be in the unknown band — frames barely larger than the crop make
# that window so small the retry loop exhausts (measured 6 s/sample at
# 352x448 vs ~0.5 s at 512x640 on this host).
H, W = 512, 640


# ---------------------------------------------------------------------------
# procedural textures
# ---------------------------------------------------------------------------

def value_noise(rng, h, w, cells, octaves=3, amp_decay=0.55):
    """Multi-octave value noise in [0,1]: coarse random grids upsampled with
    cubic interpolation (cheap on a 1-core host; no per-pixel python)."""
    out = np.zeros((h, w), np.float32)
    amp, total = 1.0, 0.0
    for o in range(octaves):
        c = max(2, int(cells * (2 ** o)))
        g = rng.rand(c, c).astype(np.float32)
        out += amp * cv2.resize(g, (w, h), interpolation=cv2.INTER_CUBIC)
        total += amp
        amp *= amp_decay
    out /= total
    return np.clip(out, 0, 1)


def make_texture(rng, h, w):
    """[h,w,3] float 0..255.  Smooth, structured — NOT white noise."""
    mode = rng.randint(0, 4)
    c0 = rng.rand(3) * 255.0
    c1 = rng.rand(3) * 255.0
    if mode == 0:                                     # linear gradient
        ang = rng.uniform(0, 2 * np.pi)
        yy, xx = np.mgrid[:h, :w].astype(np.float32)
        t = (np.cos(ang) * xx / w + np.sin(ang) * yy / h)
        t = (t - t.min()) / max(np.ptp(t), 1e-6)
        tex = c0 * (1 - t[..., None]) + c1 * t[..., None]
    elif mode == 1:                                   # colorized value noise
        n = value_noise(rng, h, w, rng.randint(2, 7))
        tex = c0 * (1 - n[..., None]) + c1 * n[..., None]
    elif mode == 2:                                   # blurred random mosaic
        c = rng.randint(3, 9)
        g = rng.rand(c, c, 3).astype(np.float32) * 255.0
        tex = cv2.resize(g, (w, h), interpolation=cv2.INTER_LINEAR)
        k = rng.randint(0, 3) * 2 + 1
        if k > 1:
            tex = cv2.GaussianBlur(tex, (k, k), 0)
    else:                                             # near-solid with shading
        n = value_noise(rng, h, w, 3, octaves=2)
        shade = 0.6 + 0.4 * n
        tex = c0[None, None] * shade[..., None]
    # low-amplitude detail so textures aren't perfectly flat
    if rng.rand() < 0.7:
        d = value_noise(rng, h, w, rng.randint(12, 40), octaves=2)
        tex = tex + (d[..., None] - 0.5) * rng.uniform(5, 35)
    return np.clip(tex, 0, 255).astype(np.float32)


# ---------------------------------------------------------------------------
# procedural alpha shapes
# ---------------------------------------------------------------------------

def _soft_from_field(field, level, feather):
    """Soft threshold: alpha ramps 0->1 across `feather` field units."""
    return np.clip((field - level) / max(feather, 1e-6) + 0.5, 0, 1)


def metaball_alpha(rng, h, w):
    k = rng.randint(2, 7)
    yy, xx = np.mgrid[:h, :w].astype(np.float32)
    field = np.zeros((h, w), np.float32)
    cy0, cx0 = h / 2, w / 2
    spread = min(h, w) * 0.22
    for _ in range(k):
        cy = cy0 + rng.uniform(-spread, spread)
        cx = cx0 + rng.uniform(-spread, spread)
        ry = rng.uniform(0.35, 1.4) * min(h, w) * 0.16
        rx = rng.uniform(0.35, 1.4) * min(h, w) * 0.16
        field += np.exp(-(((yy - cy) / ry) ** 2 + ((xx - cx) / rx) ** 2))
    feather = rng.uniform(0.02, 0.35)
    return _soft_from_field(field, rng.uniform(0.4, 0.9), feather)


def polygon_alpha(rng, h, w):
    """Star / blob polygon with a distance-transform feathered edge."""
    n = rng.randint(3, 12)
    cy, cx = h / 2, w / 2
    base_r = min(h, w) * rng.uniform(0.18, 0.33)
    angs = np.sort(rng.uniform(0, 2 * np.pi, n))
    rad = base_r * rng.uniform(0.55, 1.45, n)
    pts = np.stack([cx + rad * np.cos(angs), cy + rad * np.sin(angs)], -1)
    mask = np.zeros((h, w), np.uint8)
    cv2.fillPoly(mask, [pts.astype(np.int32)], 255)
    dist_in = cv2.distanceTransform(mask, cv2.DIST_L2, 3)
    dist_out = cv2.distanceTransform(255 - mask, cv2.DIST_L2, 3)
    sd = dist_in - dist_out
    feather = rng.uniform(1.5, 12.0)
    return np.clip(sd / feather + 0.5, 0, 1).astype(np.float32)


def ellipse_alpha(rng, h, w):
    yy, xx = np.mgrid[:h, :w].astype(np.float32)
    cy, cx = h / 2, w / 2
    ry = min(h, w) * rng.uniform(0.15, 0.32)
    rx = min(h, w) * rng.uniform(0.15, 0.32)
    th = rng.uniform(0, np.pi)
    dy, dx = yy - cy, xx - cx
    u = dx * np.cos(th) + dy * np.sin(th)
    v = -dx * np.sin(th) + dy * np.cos(th)
    d = np.sqrt((u / rx) ** 2 + (v / ry) ** 2)
    feather = rng.uniform(0.02, 0.25)
    return np.clip((1 - d) / feather + 0.5, 0, 1).astype(np.float32)


def add_hair(rng, a):
    """Thin partially-opaque filaments growing outward from the boundary —
    the hair/fur-like structure that exercises sub-pixel alpha."""
    h, w = a.shape
    edges = cv2.Canny((a * 255).astype(np.uint8), 50, 150)
    ys, xs = np.nonzero(edges)
    if len(ys) == 0:
        return a
    n = rng.randint(6, 40)
    cy, cx = h / 2, w / 2
    canvas = a.copy()
    for _ in range(n):
        i = rng.randint(0, len(ys))
        y, x = float(ys[i]), float(xs[i])
        # grow roughly outward with jitter
        vy, vx = y - cy, x - cx
        nv = max(np.hypot(vy, vx), 1e-3)
        vy, vx = vy / nv, vx / nv
        length = rng.uniform(6, 35)
        segs = rng.randint(2, 5)
        opacity = rng.uniform(0.25, 0.9)
        p0 = (x, y)
        for _s in range(segs):
            ang = np.arctan2(vy, vx) + rng.uniform(-0.6, 0.6)
            p1 = (p0[0] + np.cos(ang) * length / segs,
                  p0[1] + np.sin(ang) * length / segs)
            tmp = np.zeros((h, w), np.float32)
            cv2.line(tmp, (int(p0[0]), int(p0[1])), (int(p1[0]), int(p1[1])),
                     opacity, 1, cv2.LINE_AA)
            canvas = np.maximum(canvas, tmp)
            p0 = p1
    return canvas


def add_hole(rng, a):
    h, w = a.shape
    yy, xx = np.mgrid[:h, :w].astype(np.float32)
    ys, xs = np.nonzero(a > 0.7)
    if len(ys) < 10:
        return a
    i = rng.randint(0, len(ys))
    cy, cx = float(ys[i]), float(xs[i])
    r = rng.uniform(4, min(h, w) * 0.1)
    d = np.sqrt((yy - cy) ** 2 + (xx - cx) ** 2)
    hole = np.clip((d - r) / rng.uniform(1.0, 6.0) + 0.5, 0, 1)
    return a * hole


def make_alpha(rng, h, w):
    fn = (metaball_alpha, polygon_alpha, ellipse_alpha)[rng.randint(0, 3)]
    a = fn(rng, h, w)
    if rng.rand() < 0.3:
        a = add_hole(rng, a)
    if rng.rand() < 0.6:
        a = add_hair(rng, a)
    return a.astype(np.float32)


# ---------------------------------------------------------------------------
# video synthesis: canonical fg warped by a smooth affine trajectory
# ---------------------------------------------------------------------------

def smooth_walk(rng, n, step, start=0.0, lo=None, hi=None):
    v = np.zeros(n, np.float32)
    x = np.full(n, float(start), np.float32)
    for i in range(1, n):
        v[i] = 0.85 * v[i - 1] + rng.uniform(-step, step)
        x[i] = x[i - 1] + v[i]
        if lo is not None:
            x[i] = np.clip(x[i], lo, hi)
    return x


def render_video(rng, n_frames):
    """Returns (fg_bgr [T,H,W,3], alpha [T,H,W], bg_bgr [T,H,W,3])."""
    fg_tex = make_texture(rng, H, W)
    alpha0 = make_alpha(rng, H, W)
    # trajectory: translation / rotation / log-scale random walks
    tx = smooth_walk(rng, n_frames, rng.uniform(0.5, 3.5), 0, -W * .3, W * .3)
    ty = smooth_walk(rng, n_frames, rng.uniform(0.5, 3.5), 0, -H * .3, H * .3)
    rot = smooth_walk(rng, n_frames, rng.uniform(0.1, 1.2))
    lsc = smooth_walk(rng, n_frames, 0.004, 0, -0.25, 0.25)

    # background: larger texture panned by its own walk
    bh, bw = int(H * 1.6), int(W * 1.6)
    bg_tex = make_texture(rng, bh, bw)
    bx = smooth_walk(rng, n_frames, 1.5, (bw - W) / 2, 0, bw - W)
    by = smooth_walk(rng, n_frames, 1.5, (bh - H) / 2, 0, bh - H)

    fgs, als, bgs = [], [], []
    for t in range(n_frames):
        M = cv2.getRotationMatrix2D((W / 2, H / 2), float(rot[t]),
                                    float(np.exp(lsc[t])))
        M[0, 2] += tx[t]
        M[1, 2] += ty[t]
        f = cv2.warpAffine(fg_tex, M, (W, H), flags=cv2.INTER_LINEAR)
        a = cv2.warpAffine(alpha0, M, (W, H), flags=cv2.INTER_LINEAR)
        x0, y0 = int(bx[t]), int(by[t])
        b = bg_tex[y0:y0 + H, x0:x0 + W]
        fgs.append(f)
        als.append(np.clip(a, 0, 1))
        bgs.append(b)
    return np.stack(fgs), np.stack(als), np.stack(bgs)


# ---------------------------------------------------------------------------
# writers
# ---------------------------------------------------------------------------

def write_vm108(root, rng, n_train, n_val, n_frames):
    vbase = os.path.join(root, "VideoMatting108")
    corr = {}
    train_names, val_names = [], []
    total = n_train + n_val
    png_fast = [cv2.IMWRITE_PNG_COMPRESSION, 1]
    for vi in range(total):
        seq = f"vid{vi:03d}"
        (train_names if vi < n_train else val_names).append(seq)
        os.makedirs(os.path.join(vbase, "FG_done", seq), exist_ok=True)
        os.makedirs(os.path.join(vbase, "BG_done2", seq), exist_ok=True)
        fgs, als, bgs = render_video(rng, n_frames)
        if als[0].sum() < 100:        # dataset resamples empty-alpha clips
            fgs, als, bgs = render_video(rng, n_frames)
        for t in range(n_frames):
            fn = f"{seq}/{t:05d}.png"
            rgba = np.dstack([fgs[t].astype(np.uint8),
                              (als[t] * 255).astype(np.uint8)])
            cv2.imwrite(os.path.join(vbase, "FG_done", fn), rgba, png_fast)
            cv2.imwrite(os.path.join(vbase, "BG_done2", fn),
                        bgs[t].astype(np.uint8), png_fast)
            corr[fn] = fn
        if (vi + 1) % 20 == 0:
            print(f"  vm108 {vi + 1}/{total}")
    with open(os.path.join(vbase, "frame_corr.json"), "w") as f:
        json.dump(corr, f)
    with open(os.path.join(vbase, "train_videos.txt"), "w") as f:
        f.write("\n".join(train_names))
    with open(os.path.join(vbase, "val_videos.txt"), "w") as f:
        f.write("\n".join(val_names))


def write_dim(root, rng, n_fg, n_bg):
    base = os.path.join(root, "Combined_Dataset", "Training_set")
    fgd = os.path.join(base, "Adobe-licensed images", "fg")
    ald = os.path.join(base, "Adobe-licensed images", "alpha")
    bgd = os.path.join(base, "train2014")
    for d in (fgd, ald, bgd):
        os.makedirs(d, exist_ok=True)
    names = []
    h, w = 512, 640
    for i in range(n_fg):
        name = f"fg{i:03d}.png"
        names.append(name)
        cv2.imwrite(os.path.join(fgd, name),
                    make_texture(rng, h, w).astype(np.uint8))
        cv2.imwrite(os.path.join(ald, name),
                    (make_alpha(rng, h, w) * 255).astype(np.uint8))
    for i in range(n_bg):
        cv2.imwrite(os.path.join(bgd, f"bg{i:03d}.jpg"),
                    make_texture(rng, h, w).astype(np.uint8))
    with open(os.path.join(base, "training_fg_names.txt"), "w") as f:
        f.write("\n".join(names))


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("root", nargs="?", default="/tmp/synth_data",
                   help="output directory (default /tmp/synth_data)")
    p.add_argument("--n-train", type=int, default=112)
    p.add_argument("--n-val", type=int, default=8)
    p.add_argument("--frames", type=int, default=28)
    p.add_argument("--dim-fg", type=int, default=100)
    p.add_argument("--dim-bg", type=int, default=80)
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args()
    rng = np.random.RandomState(args.seed)
    print("writing DIM set ...")
    write_dim(args.root, rng, args.dim_fg, args.dim_bg)
    print("writing VM108 set ...")
    write_vm108(args.root, rng, args.n_train, args.n_val, args.frames)
    print(f"synthetic data at {args.root}")


if __name__ == "__main__":
    main()
