"""Generate tiny synthetic DIM + VideoMatting108 directory trees so the
training entry points can be smoke-run without the real datasets
(mirrors the fixtures in tests/test_data.py).

Usage: python scripts/make_synth_data.py /tmp/synth_data
"""
from __future__ import annotations

import json
import os
import sys

import cv2
import numpy as np


def circle_alpha(h, w, r_frac=0.3):
    yy, xx = np.mgrid[:h, :w]
    d = np.sqrt((yy - h / 2) ** 2 + (xx - w / 2) ** 2)
    r = r_frac * min(h, w)
    return np.clip((r - d) / 8 + 0.5, 0, 1).astype(np.float32)


def main(root: str):
    rng = np.random.RandomState(0)

    # DIM / Combined_Dataset
    base = os.path.join(root, "Combined_Dataset", "Training_set")
    fgd = os.path.join(base, "Adobe-licensed images", "fg")
    ald = os.path.join(base, "Adobe-licensed images", "alpha")
    bgd = os.path.join(base, "train2014")
    for d in (fgd, ald, bgd):
        os.makedirs(d, exist_ok=True)
    names = []
    for i in range(4):
        name = f"fg{i}.png"
        names.append(name)
        cv2.imwrite(os.path.join(fgd, name),
                    rng.randint(0, 255, (400, 480, 3), np.uint8))
        cv2.imwrite(os.path.join(ald, name),
                    (circle_alpha(400, 480, 0.25 + 0.03 * i) * 255).astype(np.uint8))
    for i in range(6):
        cv2.imwrite(os.path.join(bgd, f"bg{i}.jpg"),
                    rng.randint(0, 255, (400, 500, 3), np.uint8))
    with open(os.path.join(base, "training_fg_names.txt"), "w") as f:
        f.write("\n".join(names))

    # VideoMatting108
    vbase = os.path.join(root, "VideoMatting108")
    corr = {}
    for seq in ("vidA", "vidB"):
        os.makedirs(os.path.join(vbase, "FG_done", seq), exist_ok=True)
        os.makedirs(os.path.join(vbase, "BG_done2", seq), exist_ok=True)
        for i in range(16):
            fn = f"{seq}/{i:05d}.png"
            rgba = np.dstack([
                rng.randint(0, 255, (360, 440, 3), np.uint8),
                (circle_alpha(360, 440, 0.2 + 0.01 * i) * 255).astype(np.uint8)])
            cv2.imwrite(os.path.join(vbase, "FG_done", fn), rgba)
            cv2.imwrite(os.path.join(vbase, "BG_done2", fn),
                        rng.randint(0, 255, (360, 440, 3), np.uint8))
            corr[fn] = fn
    with open(os.path.join(vbase, "frame_corr.json"), "w") as f:
        json.dump(corr, f)
    with open(os.path.join(vbase, "train_videos.txt"), "w") as f:
        f.write("vidA\nvidB")
    with open(os.path.join(vbase, "val_videos.txt"), "w") as f:
        f.write("vidB")
    print(f"synthetic data at {root}")


if __name__ == "__main__":
    import argparse

    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("root", nargs="?", default="/tmp/synth_data",
                   help="output directory (default /tmp/synth_data)")
    main(p.parse_args().root)
