"""Image I/O + visualization helpers.

The main-path subset of the reference's util/image_io.py (:1-414 — ~30
helpers, mostly unused; SURVEY.md flags it as heritage): PIL/numpy
converters, torchvision-style grid save, per-epoch sample dumps, and the
SOTS GT border crop (reference: util/image_io.py:20-37, d=10).
All functions are host-side numpy on HWC [0,1] floats.
"""

from __future__ import annotations

import math
import os

import numpy as np


def pil_to_np(img) -> np.ndarray:
    """PIL -> float32 HWC in [0,1] (reference exposes the CHW variant; HWC is
    the native layout here)."""
    return np.asarray(img.convert("RGB"), np.float32) / 255.0


def np_to_pil(arr: np.ndarray):
    from PIL import Image
    a = np.clip(np.asarray(arr) * 255.0 + 0.5, 0, 255).astype(np.uint8)
    if a.ndim == 3 and a.shape[-1] == 1:
        a = a[..., 0]
    return Image.fromarray(a)


def save_image(path: str, images: np.ndarray, *, nrow: int = 8,
               padding: int = 2) -> None:
    """torchvision.utils.save_image equivalent: (B,H,W,C) or (H,W,C) in
    [0,1] -> PNG grid."""
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    arr = np.asarray(images, np.float32)
    if arr.ndim == 3:
        arr = arr[None]
    b, h, w, c = arr.shape
    if b == 0:
        raise ValueError(f"save_image({path!r}): empty batch")
    ncol = min(nrow, b)
    nrows = math.ceil(b / ncol)
    grid = np.zeros((nrows * (h + padding) + padding,
                     ncol * (w + padding) + padding, c), np.float32)
    for i in range(b):
        r, col = divmod(i, ncol)
        y = padding + r * (h + padding)
        x = padding + col * (w + padding)
        grid[y:y + h, x:x + w] = arr[i]
    np_to_pil(grid).save(path)


def prepare_gt_img(img: np.ndarray, d: int = 10) -> np.ndarray:
    """SOTS GT border crop (reference: util/image_io.py:20-37): outdoor SOTS
    ground truths carry a d-pixel border the hazy inputs don't.
    d=0 is the identity (img[0:-0] would be an empty slice)."""
    if d == 0:
        return img
    return img[d:-d, d:-d, :]


def save_sample_grid(out_dir: str, tag: str, **named_images) -> None:
    """Per-checkpoint sample dump (replaces the reference's per-10-iteration
    PNG writes inside the train loop, trainer.py:355-358)."""
    for name, img in named_images.items():
        save_image(os.path.join(out_dir, f"{tag}_{name}.png"), np.asarray(img))
