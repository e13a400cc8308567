"""Materialize an SRx{scale} 'single'-type training folder from HR images.

The reference trains SR via the 'single' degradation type with LR inputs
pre-upscaled by MATLAB bicubic (reference: README.md:17,107-113;
util/dataset_utils.py:156-163). This tool produces that layout from any HR
folder (e.g. DIV2K) using the MATLAB-faithful imresize:

    out/degraded/<name>  = bicubic_up(bicubic_down(HR, 1/scale), scale)
    out/target/<name>    = HR

Usage: python tools/make_sr_folder.py <hr_dir> <out_dir> [scale=4]
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
from PIL import Image

from rcot_tpu.data.datasets import list_image_folder
from rcot_tpu.data.sr import sr_degrade


def main():
    hr_dir, out_dir = sys.argv[1], sys.argv[2]
    scale = int(sys.argv[3]) if len(sys.argv) > 3 else 4
    os.makedirs(os.path.join(out_dir, "degraded"), exist_ok=True)
    os.makedirs(os.path.join(out_dir, "target"), exist_ok=True)
    files = list_image_folder(hr_dir)
    for i, f in enumerate(files):
        name = os.path.basename(f)
        hr = np.asarray(Image.open(f).convert("RGB"), np.uint8)
        # crop so H,W divide the scale exactly (clean LR grid)
        h, w = (hr.shape[0] // scale) * scale, (hr.shape[1] // scale) * scale
        hr = hr[:h, :w]
        deg = sr_degrade(hr, scale)
        Image.fromarray(deg).save(os.path.join(out_dir, "degraded", name))
        Image.fromarray(hr).save(os.path.join(out_dir, "target", name))
        if i % 50 == 0:
            print(f"{i}/{len(files)}", flush=True)
    print(f"wrote {len(files)} pairs to {out_dir}")


if __name__ == "__main__":
    main()
