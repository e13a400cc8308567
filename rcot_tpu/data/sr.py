"""Super-resolution degradation: MATLAB-bicubic down-then-up synthesis.

The reference treats SR as the 'single' degradation type with LR inputs
pre-upscaled by MATLAB bicubic offline (reference: README.md:17,
util/imresize.py heritage; de_id 7 at util/dataset_utils.py:156-163,256-260).
tools/make_sr_folder.py builds that offline folder from HR images with
sr_degrade below; the training pipeline then consumes it through the
standard 'single' de_type (degraded/ + target/). (An on-the-fly
SRTrainDataset variant existed but nothing constructed it — removed.)
"""

from __future__ import annotations

import numpy as np

from .imresize import imresize


def sr_degrade(img_u8: np.ndarray, scale: int = 4) -> np.ndarray:
    """HR uint8 -> bicubic-down-then-up degraded input at the same size."""
    h, w = img_u8.shape[:2]
    lr = imresize(img_u8, scale=1.0 / scale)
    return imresize(lr, output_shape=(h, w))
