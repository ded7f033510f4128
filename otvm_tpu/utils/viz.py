"""Training visualization: periodic image grids (train.py:255-275,
torchvision save_image equivalent in numpy/cv2)."""
from __future__ import annotations

import os
from typing import Sequence

import numpy as np


def make_grid(images: Sequence[np.ndarray], nrow: int = 8, pad: int = 2) -> np.ndarray:
    """images: list of [H, W, 3] float in [0,1] -> grid [gh, gw, 3]."""
    n = len(images)
    h, w = images[0].shape[:2]
    ncol = (n + nrow - 1) // nrow
    grid = np.ones((ncol * (h + pad) + pad, nrow * (w + pad) + pad, 3), np.float32)
    for i, img in enumerate(images):
        r, c = divmod(i, nrow)
        y = r * (h + pad) + pad
        x = c * (w + pad) + pad
        if img.ndim == 2:
            img = np.repeat(img[..., None], 3, -1)
        grid[y:y + h, x:x + w] = img[..., :3]
    return grid


def save_train_grid(path: str, batch, aux, max_items: int = 4) -> None:
    """[image | gt alpha | pred alpha | comp] rows for the first few clips
    (the write_image panel of train.py:255-275)."""
    import cv2

    fg, bg, alpha = batch["fg"], batch["bg"], batch["alpha"]
    img = fg * alpha + bg * (1 - alpha)
    preds = np.asarray(aux["alphas"])          # [B,S,H,W,1]
    comps = np.asarray(aux["comps"])
    b = min(max_items, img.shape[0])
    s = img.shape[1]
    tiles = []
    for i in range(b):
        for t in range(s):
            tiles.append(np.asarray(img[i, t]))
    for i in range(b):
        for t in range(s):
            tiles.append(np.repeat(np.asarray(alpha[i, t]), 3, -1))
    for i in range(b):
        for t in range(s):
            tiles.append(np.repeat(np.clip(preds[i, t], 0, 1), 3, -1))
    for i in range(b):
        for t in range(s):
            tiles.append(np.clip(comps[i, t], 0, 1))
    grid = make_grid(tiles, nrow=b * s)
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    cv2.imwrite(path, (grid[..., ::-1] * 255).astype(np.uint8))
