"""Compose the demo matte into an animated GIF for the README.

The reference ships its demo as a video on the project page (README.md:3);
this is the rebuild's equivalent artifact: for each frame of a demo
sequence we show [input | predicted alpha | composite on green], animated.

PIL-only (no ffmpeg/imageio dependency in this image).

Usage (after `python eval.py --demo --outdir OUT ...` has written
OUT/pred/<seq>/*.png):
  python scripts/make_demo_gif.py --frames /root/reference/demo/dove/frames \
      --alphas OUT/pred/dove --out docs/viz/dove_matte.gif --max-edge 360
"""
from __future__ import annotations

import argparse
import os

import numpy as np
from PIL import Image

GREEN = np.array([60, 180, 75], np.float32)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--frames", required=True, help="dir of input jpg/png frames")
    p.add_argument("--alphas", required=True, help="dir of predicted alpha pngs")
    p.add_argument("--out", required=True)
    p.add_argument("--max-edge", type=int, default=360,
                   help="downscale so min(H,W) <= this (GIF size control)")
    p.add_argument("--fps", type=float, default=8.0)
    args = p.parse_args()

    frame_names = sorted(os.listdir(args.frames))
    alpha_names = sorted(os.listdir(args.alphas))
    assert len(frame_names) == len(alpha_names), \
        f"{len(frame_names)} frames vs {len(alpha_names)} alphas"

    panels = []
    for fn, an in zip(frame_names, alpha_names):
        img = Image.open(os.path.join(args.frames, fn)).convert("RGB")
        alp = Image.open(os.path.join(args.alphas, an)).convert("L")
        if alp.size != img.size:
            alp = alp.resize(img.size, Image.BILINEAR)
        if min(img.size) > args.max_edge:
            s = args.max_edge / min(img.size)
            size = (round(img.size[0] * s), round(img.size[1] * s))
            img, alp = img.resize(size, Image.BILINEAR), alp.resize(size, Image.BILINEAR)
        rgb = np.asarray(img, np.float32)
        a = np.asarray(alp, np.float32)[..., None] / 255.0
        comp = rgb * a + GREEN * (1.0 - a)
        strip = np.concatenate(
            [rgb, np.repeat(a * 255.0, 3, axis=-1), comp], axis=1)
        panels.append(Image.fromarray(strip.astype(np.uint8)))

    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    panels[0].save(args.out, save_all=True, append_images=panels[1:],
                   duration=int(1000 / args.fps), loop=0)
    print(f"{args.out}: {len(panels)} frames, "
          f"{os.path.getsize(args.out) / 1e6:.2f} MB")


if __name__ == "__main__":
    main()
