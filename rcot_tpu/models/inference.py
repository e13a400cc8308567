"""Full-resolution inference: pad-to-mod-8, shape bucketing, overlap tiling.

The reference crops test images to mod-4 and feeds variable full-res shapes
one at a time (reference: tester.py:77-107) — which both violates the
network's mod-8 contract (SURVEY.md §2.2 #9) and would recompile XLA per
shape. This module fixes both:

- pad_to_multiple: reflect-pad up to the contract, crop back after (lossless,
  unlike the reference's cropping which discards pixels);
- bucketed whole-image inference: pad H,W up to the next bucket so a folder
  of arbitrary sizes compiles only a handful of programs;
- overlap-tiled inference with uniform-weight blending for images too large
  for HBM — the working version of the reference's dead tile_degrad
  (util/dataset_utils.py:323-347) and slice/splice utilities
  (util/image_utils.py:68-98), batched so tiles fill the MXU.
"""

from __future__ import annotations

from typing import Callable, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def pad_to_multiple(x: jax.Array, base: int = 8) -> Tuple[jax.Array, Tuple[int, int]]:
    """Reflect-pad (B, H, W, C) so H, W % base == 0. Returns (padded, (H, W))."""
    _, h, w, _ = x.shape
    ph = (-h) % base
    pw = (-w) % base
    if ph or pw:
        x = jnp.pad(x, ((0, 0), (0, ph), (0, pw), (0, 0)), mode="reflect")
    return x, (h, w)


def crop_back(y: jax.Array, hw: Tuple[int, int]) -> jax.Array:
    h, w = hw
    return y[:, :h, :w, :]


def bucket_size(n: int, base: int = 8, buckets: Tuple[int, ...] = ()) -> int:
    """Round n up to the next bucket (or next multiple of base past the last)."""
    for b in buckets:
        if n <= b:
            return b
    return ((n + base - 1) // base) * base


class Restorer:
    """Jit-cached whole-image / tiled restoration around a model apply fn.

    model_fn: (x: (B,H,W,C)) -> (B,H,W,C), H,W % 8 == 0. Shapes are bucketed
    so repeated calls over a test folder reuse compiled programs.
    """

    def __init__(self, model_fn: Callable[[jax.Array], jax.Array], *,
                 pad_base: int = 8,
                 buckets: Tuple[int, ...] = (128, 256, 384, 512, 768, 1024),
                 tile: int = 0, tile_overlap: int = 32):
        self.pad_base = pad_base
        self.buckets = buckets
        self.tile = tile
        self.tile_overlap = tile_overlap
        self._jitted = jax.jit(model_fn)

    def __call__(self, img: np.ndarray) -> np.ndarray:
        """img: (H, W, C) float32 in [0,1] -> restored (H, W, C)."""
        x = jnp.asarray(img)[None]
        if self.tile and max(img.shape[:2]) > self.tile:
            out = self._tiled(x)
        else:
            out = self._whole(x)
        return np.asarray(out[0])

    def _whole(self, x: jax.Array) -> jax.Array:
        _, h, w, _ = x.shape
        bh = bucket_size(h, self.pad_base, self.buckets)
        bw = bucket_size(w, self.pad_base, self.buckets)
        padded = jnp.pad(x, ((0, 0), (0, bh - h), (0, bw - w), (0, 0)),
                         mode="reflect") if (bh > h or bw > w) else x
        y = self._jitted(padded)
        return y[:, :h, :w, :]

    def _tiled(self, x: jax.Array) -> jax.Array:
        """Overlap-tiled restoration with FEATHERED blending; all tiles run
        as one batched forward so the MXU stays full.

        Feathering: each tile contributes with a separable tent profile that
        ramps linearly across the overlap band, so seams blend smoothly
        instead of averaging with a hard step (the working, improved version
        of the reference's dead tile_degrad, util/dataset_utils.py:323-347).
        Interior weights are constant, and profiles are renormalized by the
        accumulated weight, so fully-covered pixels are exact.
        """
        tile, ov = self.tile, self.tile_overlap
        _, h, w, c = x.shape
        t = min(tile, h, w)
        t -= t % self.pad_base
        stride = t - ov
        hs = list(range(0, max(h - t, 0) + 1, stride))
        ws = list(range(0, max(w - t, 0) + 1, stride))
        if hs[-1] != h - t:
            hs.append(h - t)
        if ws[-1] != w - t:
            ws.append(w - t)

        tiles = jnp.stack([x[0, i:i + t, j:j + t, :] for i in hs for j in ws])
        outs = self._jitted(tiles).astype(jnp.float32)

        # separable tent: ramp over the overlap width, flat in the interior
        ramp = np.ones(t, np.float32)
        if ov > 0:
            edge = np.linspace(1.0 / (ov + 1), 1.0, ov, dtype=np.float32)
            ramp[:ov] = edge
            ramp[-ov:] = edge[::-1]
        prof = jnp.asarray(np.outer(ramp, ramp))[:, :, None]

        acc = jnp.zeros((h, w, c), jnp.float32)
        weight = jnp.zeros((h, w, 1), jnp.float32)
        k = 0
        for i in hs:
            for j in ws:
                acc = acc.at[i:i + t, j:j + t, :].add(outs[k] * prof)
                weight = weight.at[i:i + t, j:j + t, :].add(prof)
                k += 1
        return (acc / weight)[None]


def make_restorer(params, model_cfg, *, tile: int = 0, tile_overlap: int = 32,
                  dtype=jnp.float32) -> Restorer:
    from .restormer import apply_tnet

    def fn(x):
        out2, _, _ = apply_tnet(params, x.astype(dtype), model_cfg)
        return out2.astype(jnp.float32)

    return Restorer(fn, tile=tile, tile_overlap=tile_overlap)
