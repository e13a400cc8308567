"""Host-side datasets: manifests, oversampling, GT-path derivation, crops.

Behavioral spec (reference: util/dataset_utils.py:27-281):
- Manifest-driven id lists per degradation with oversampling factors
  (denoise x5 :89-101, derain x360 :123, deblur x5 :135, lowlight x20 :152,
  single x5 :161); de_id scheme {denoise_15:0, _25:1, _50:2, derain:3,
  dehaze:4, deblur:5, lowlight:6, single:7} (:40).
- Images center-cropped to multiples of 16 (:226), then a random patch crop;
  paired tasks crop degraded+clean jointly (:166-175).
- GT-path rules: rain 'rainy/rain-N.png' -> 'gt/norain-N.png' (:177-179);
  haze 'synthetic/<p>_rest.ext' -> 'original/<p>.ext' (:181-186); deblur
  blur/ vs sharp/; lowlight low/ vs high/; single degraded/ vs target/.

The host does decode + crop ONLY; augmentation and noise synthesis run
on-device (data/degradations.py). Samples yield uint8 (P, P, C) patches with
degraded == clean for denoise ids.
"""

from __future__ import annotations

import os
import random
from dataclasses import dataclass
from typing import List, Optional, Tuple

import numpy as np

from ..utils.config import DataConfig, DE_DICT

try:
    from PIL import Image
except ImportError:  # pragma: no cover
    Image = None


def crop_to_base(img: np.ndarray, base: int = 16) -> np.ndarray:
    """Center-crop HWC to multiples of `base` (reference: util/image_utils.py:59-64)."""
    h, w = img.shape[:2]
    ch, cw = h % base, w % base
    return img[ch // 2:h - ch + ch // 2, cw // 2:w - cw + cw // 2, :]


def load_rgb(path: str) -> np.ndarray:
    img = Image.open(path).convert("RGB")
    return np.asarray(img, dtype=np.uint8)


def rain_gt_path(rainy: str) -> str:
    """'.../rainy/rain-N.png' -> '.../gt/norain-N.png' (dataset_utils.py:177-179)."""
    return rainy.split("rainy")[0] + "gt/norain-" + rainy.split("rain-")[-1]


def haze_gt_path(hazy: str) -> str:
    """'.../synthetic/<p>_*.ext' -> '.../original/<p>.ext' (dataset_utils.py:181-186)."""
    dir_name = hazy.split("synthetic")[0] + "original/"
    name = hazy.split("/")[-1].split("_")[0]
    suffix = "." + hazy.split(".")[-1]
    return dir_name + name + suffix


@dataclass
class Sample:
    degraded_path: str
    clean_path: str
    de_id: int


class TrainIndex:
    """Builds the oversampled shuffled id list for the configured de_types."""

    def __init__(self, cfg: DataConfig, rng: Optional[random.Random] = None):
        self.cfg = cfg
        self.rng = rng or random.Random(0)
        self.samples: List[Sample] = []
        self._build()

    def _manifest(self, rel: str) -> List[str]:
        path = os.path.join(self.cfg.data_file_dir, rel)
        with open(path) as f:
            return [ln.strip() for ln in f if ln.strip()]

    def _build(self) -> None:
        cfg = self.cfg
        ov = cfg.oversample
        de = cfg.de_type
        add = self.samples.extend

        # every os.listdir is sorted: listing order is filesystem-dependent,
        # and the index order IS the determinism/resume/multi-host contract
        # (pipeline.py shuffles a (seed, epoch)-keyed permutation of it and
        # hosts take strided slices — all hosts must see the same base order)
        denoise_ids = [t for t in ("denoise_15", "denoise_25", "denoise_50") if t in de]
        if denoise_ids:
            names = set(self._manifest("noisy/denoise.txt"))
            listing = [cfg.denoise_dir + n
                       for n in sorted(os.listdir(cfg.denoise_dir))
                       if n.strip() in names]
            for t in denoise_ids:
                batch = [Sample(p, p, DE_DICT[t]) for p in listing] * ov["denoise"]
                self.rng.shuffle(batch)
                add(batch)
        if "derain" in de:
            rainy = [cfg.derain_dir + n for n in self._manifest("rainy/rainTrain.txt")]
            add([Sample(p, rain_gt_path(p), 3) for p in rainy] * ov["derain"])
        if "dehaze" in de:
            hazy = [cfg.dehaze_dir + n for n in self._manifest("hazy/hazy_outside.txt")]
            add([Sample(p, haze_gt_path(p), 4) for p in hazy])
        if "deblur" in de:
            names = sorted(os.listdir(os.path.join(cfg.deblur_dir, "sharp/")))
            add([Sample(os.path.join(cfg.deblur_dir, "blur/", n),
                        os.path.join(cfg.deblur_dir, "sharp/", n), 5)
                 for n in names] * ov["deblur"])
        if "lowlight" in de:
            names = sorted(os.listdir(os.path.join(cfg.lowlight_dir, "low/")))
            add([Sample(os.path.join(cfg.lowlight_dir, "low/", n),
                        os.path.join(cfg.lowlight_dir, "high/", n), 6)
                 for n in names] * ov["lowlight"])
        if "single" in de:
            names = sorted(os.listdir(os.path.join(cfg.single_dir, "degraded/")))
            add([Sample(os.path.join(cfg.single_dir, "degraded/", n),
                        os.path.join(cfg.single_dir, "target/", n), 7)
                 for n in names] * ov["single"])

    def __len__(self) -> int:
        return len(self.samples)


def _check_patchable(path: str, h: int, w: int, patch_size: int,
                     crop_base: int) -> None:
    """Name the offending FILE when an image is too small for the patch crop:
    the bare rng.randint 'empty range' would otherwise surface from a worker
    thread with no way to tell which input caused it."""
    if h < patch_size or w < patch_size:
        raise ValueError(
            f"training image {path!r} is {h}x{w} after the mod-{crop_base} "
            f"center crop — smaller than patch_size={patch_size}")


def get_patch_pair(sample: Sample, patch_size: int, crop_base: int,
                   rng: random.Random) -> Tuple[np.ndarray, np.ndarray, int]:
    """Decode + crop one sample -> (degraded_patch, clean_patch, de_id), uint8.

    Denoise ids return clean for both slots (noise is synthesized on device).
    Paired ids crop jointly at one random location (dataset_utils.py:166-175).
    """
    if sample.de_id < 3:
        clean = crop_to_base(load_rgb(sample.clean_path), crop_base)
        h, w = clean.shape[:2]
        _check_patchable(sample.clean_path, h, w, patch_size, crop_base)
        i = rng.randint(0, h - patch_size)
        j = rng.randint(0, w - patch_size)
        patch = clean[i:i + patch_size, j:j + patch_size]
        return patch, patch, sample.de_id
    degraded = crop_to_base(load_rgb(sample.degraded_path), crop_base)
    clean = crop_to_base(load_rgb(sample.clean_path), crop_base)
    h, w = degraded.shape[:2]
    _check_patchable(sample.degraded_path, h, w, patch_size, crop_base)
    # the shared (i, j) indexes BOTH frames, so the clean image must fit
    # the patch too (a mis-paired/corrupt GT otherwise surfaces as an
    # anonymous np.stack shape error from a worker thread)
    _check_patchable(sample.clean_path, *clean.shape[:2], patch_size,
                     crop_base)
    i = rng.randint(0, h - patch_size)
    j = rng.randint(0, w - patch_size)
    return (degraded[i:i + patch_size, j:j + patch_size],
            clean[i:i + patch_size, j:j + patch_size], sample.de_id)


def list_image_folder(path: str) -> List[str]:
    exts = (".png", ".jpg", ".jpeg", ".bmp")
    return sorted(os.path.join(path, n) for n in os.listdir(path)
                  if n.lower().endswith(exts))


def eval_pairs(degset: str, tarset: str) -> List[Tuple[str, str]]:
    """Sorted-glob pairing of degraded/target folders (reference: tester.py:55-58)."""
    return list(zip(list_image_folder(degset), list_image_folder(tarset)))


def collapse_de_id(de_id):
    """noise_combine label collapse (reference: util/dataset_utils.py:267-277):
    all denoise ids -> 0, others shift down by 2 ({0,1,2}->0, 3->1, 4->2,
    5->3, 6->4). Works on ints or arrays. NOTE: the trainer's loss branches on
    the CANONICAL ids (de_id < 3 == noise, trainer.py:329), so batches always
    carry canonical ids; this mapping is for prompt-style harnesses."""
    import numpy as _np
    collapsed = _np.asarray(de_id) - 2
    return _np.maximum(collapsed, 0) if hasattr(collapsed, "shape") else max(collapsed, 0)
