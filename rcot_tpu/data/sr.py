"""Super-resolution dataset: on-the-fly bicubic LR synthesis.

The reference treats SR as the 'single' degradation type with LR inputs
pre-upscaled by MATLAB bicubic offline (reference: README.md:17,
util/imresize.py heritage; de_id 7 at util/dataset_utils.py:156-163,256-260).
This dataset synthesizes that pipeline on the fly from an HR folder using the
MATLAB-faithful imresize: HR patch -> x(1/s) bicubic+antialias -> xs bicubic
up -> degraded input, so a DIV2K-style folder trains SRx{s} directly
(BASELINE.json config #5).
"""

from __future__ import annotations

import random
from typing import Tuple

import numpy as np

from .datasets import crop_to_base, list_image_folder, load_rgb
from .imresize import imresize


class SRTrainDataset:
    """HR image folder -> (bicubic-degraded, HR) uint8 patch pairs, de_id=7."""

    def __init__(self, hr_dir: str, *, scale: int = 4, patch_size: int = 128,
                 crop_base: int = 16, oversample: int = 5):
        self.files = list_image_folder(hr_dir) * oversample
        self.scale = scale
        self.patch_size = patch_size
        self.crop_base = crop_base

    def __len__(self) -> int:
        return len(self.files)

    def get(self, idx: int, rng: random.Random) -> Tuple[np.ndarray, np.ndarray, int]:
        hr = crop_to_base(load_rgb(self.files[idx]), self.crop_base)
        h, w = hr.shape[:2]
        ps = self.patch_size
        i = rng.randint(0, h - ps)
        j = rng.randint(0, w - ps)
        patch = hr[i:i + ps, j:j + ps]
        lr = imresize(patch, scale=1.0 / self.scale)
        degraded = imresize(lr, output_shape=(ps, ps))
        return degraded, patch, 7


def sr_degrade(img_u8: np.ndarray, scale: int = 4) -> np.ndarray:
    """HR uint8 -> bicubic-down-then-up degraded input at the same size."""
    h, w = img_u8.shape[:2]
    lr = imresize(img_u8, scale=1.0 / scale)
    return imresize(lr, output_shape=(h, w))
