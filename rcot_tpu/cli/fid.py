"""rcot-fid: FID between two image folders (or saved .npz statistics).

Mirrors the vendored pytorch-fid CLI (reference: fid_score.py:54-71,294-324):
`python -m rcot_tpu.cli.fid path1 path2 [--batch-size 50] [--save-stats]`.
Paths may be folders of images or precomputed .npz stats. Feature extraction
is the jitted JAX InceptionV3 (metrics/inception.py) with the reference's
preprocessing: PIL resize to 256 / center-crop 256 / ToTensor
(fid_score.py:120-124), then the network's own 299 bilinear resize + [-1,1]
normalization.
"""

from __future__ import annotations

import argparse
import functools
from typing import Optional

import numpy as np


def _load_and_preprocess(path: str, size: int = 256) -> np.ndarray:
    """torchvision Resize(size) + CenterCrop(size) + ToTensor, exactly
    (the reference pipeline, fid_score.py:120-124): the long side is
    int(size * long / short) — TRUNCATION, not round (640x427 -> 383, not
    384) — and the crop offset is int(round(diff / 2.0)), which differs
    from diff // 2 by 1px when diff is 3 mod 4."""
    from PIL import Image

    img = Image.open(path).convert("RGB")
    w, h = img.size
    if w < h:
        nw, nh = size, max(size, int(size * h / w))
    else:
        nh, nw = size, max(size, int(size * w / h))
    img = img.resize((nw, nh), Image.BILINEAR)
    left = int(round((nw - size) / 2.0))
    top = int(round((nh - size) / 2.0))
    img = img.crop((left, top, left + size, top + size))
    return np.asarray(img, np.float32) / 255.0


@functools.lru_cache(maxsize=2)
def _cached_feat_fn(weights: Optional[str]):
    """One (params, jitted fn) per weights path — folder_activations runs
    once per folder and would otherwise reload weights and re-trace per
    call (compute_fid_folders makes two)."""
    import jax

    from ..metrics.inception import inception_pool3, init_inception_params

    params = init_inception_params(weights)
    return jax.jit(lambda x: inception_pool3(params, x))


def folder_activations(folder: str, *, batch_size: int = 50,
                       weights: Optional[str] = None) -> np.ndarray:
    import jax.numpy as jnp

    from ..data.datasets import list_image_folder

    feat_fn = _cached_feat_fn(weights)

    files = list_image_folder(folder)
    if not files:
        raise ValueError(f"no images in {folder}")
    feats = []
    for i in range(0, len(files), batch_size):
        chunk = files[i:i + batch_size]
        batch = np.stack([_load_and_preprocess(f) for f in chunk])
        # pad the tail batch so only one program is compiled
        pad = batch_size - len(chunk)
        if pad:
            batch = np.concatenate([batch, np.zeros((pad,) + batch.shape[1:],
                                                    np.float32)])
        out = np.asarray(feat_fn(jnp.asarray(batch)))
        feats.append(out[:len(chunk)])
    return np.concatenate(feats)


def _stats_for(path: str, batch_size: int, weights: Optional[str]):
    from ..metrics.frechet import activation_statistics, load_stats

    if path.endswith(".npz"):
        return load_stats(path)
    return activation_statistics(
        folder_activations(path, batch_size=batch_size, weights=weights))


def compute_fid_folders(path1: str, path2: str, *, batch_size: int = 50,
                        weights: Optional[str] = None) -> float:
    from ..metrics.frechet import frechet_distance

    mu1, s1 = _stats_for(path1, batch_size, weights)
    mu2, s2 = _stats_for(path2, batch_size, weights)
    return frechet_distance(mu1, s1, mu2, s2)


def main(argv=None) -> None:
    p = argparse.ArgumentParser(description="rcot-tpu FID")
    p.add_argument("paths", nargs=2, help="image folders or .npz stats")
    p.add_argument("--batch-size", type=int, default=50)
    p.add_argument("--inception-weights", default=None)
    p.add_argument("--save-stats", action="store_true",
                   help="treat paths as (image_folder, out_stats.npz)")
    args = p.parse_args(argv)

    from ..utils.compilation_cache import enable_compilation_cache
    enable_compilation_cache()

    if args.save_stats:
        from ..metrics.frechet import activation_statistics, save_stats
        mu, sigma = activation_statistics(folder_activations(
            args.paths[0], batch_size=args.batch_size,
            weights=args.inception_weights))
        save_stats(args.paths[1], mu, sigma)
        print(f"saved stats to {args.paths[1]}")
        return
    fid = compute_fid_folders(args.paths[0], args.paths[1],
                              batch_size=args.batch_size,
                              weights=args.inception_weights)
    print(f"FID: {fid:.6f}")


if __name__ == "__main__":
    main()
