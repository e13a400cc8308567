"""MATLAB-faithful imresize (host-side numpy).

Behavioral spec (reference: util/imresize.py — a MATLAB-exact resize with
antialiasing used by the SR preprocessing heritage; README.md:17 notes LR
inputs are bicubic-pre-upscaled). Implemented from the MATLAB algorithm
definition, not transcribed: for each output coordinate u, sample positions
x = (u + 0.5) / scale - 0.5 (0-based), kernel support widened by 1/scale when
downscaling (antialiasing), weights normalized to sum 1. Boundary taps follow
the REFERENCE's semantics, not MATLAB's replicate-clamp: out-of-range taps
mirror back into the image (see the boundary comment in _contributions,
reference util/imresize.py:113-126); integer inputs round half away from
zero and saturate (MATLAB semantics).

Kernels: 'cubic' (Keys a=-0.5, MATLAB's bicubic), 'linear', 'box',
'lanczos2', 'lanczos3'.
"""

from __future__ import annotations

from typing import Tuple

import numpy as np


def _cubic(x: np.ndarray) -> np.ndarray:
    """MATLAB bicubic kernel (Keys, a = -0.5), support 4."""
    ax = np.abs(x)
    ax2, ax3 = ax ** 2, ax ** 3
    return ((1.5 * ax3 - 2.5 * ax2 + 1) * (ax <= 1)
            + (-0.5 * ax3 + 2.5 * ax2 - 4 * ax + 2) * ((ax > 1) & (ax <= 2)))


def _linear(x: np.ndarray) -> np.ndarray:
    ax = np.abs(x)
    return np.maximum(0.0, 1.0 - ax)


def _box(x: np.ndarray) -> np.ndarray:
    return ((x > -0.5) & (x <= 0.5)).astype(np.float64)


def _sinc(x: np.ndarray) -> np.ndarray:
    x = np.where(x == 0, 1e-32, x)
    return np.sin(np.pi * x) / (np.pi * x)


def _lanczos(x: np.ndarray, taps: int) -> np.ndarray:
    return _sinc(x) * _sinc(x / taps) * (np.abs(x) < taps)


_KERNELS = {
    "cubic": (_cubic, 4.0),
    "linear": (_linear, 2.0),
    "box": (_box, 1.0),
    "lanczos2": (lambda x: _lanczos(x, 2), 4.0),
    "lanczos3": (lambda x: _lanczos(x, 3), 6.0),
}


def _contributions(in_len: int, out_len: int, scale: float, kernel: str,
                   antialias: bool) -> Tuple[np.ndarray, np.ndarray]:
    """Per-output-pixel (weights, indices) like MATLAB's contributions()."""
    kfun, width = _KERNELS[kernel]
    if scale < 1 and antialias:
        def h(x):
            return scale * kfun(scale * x)
        kernel_width = width / scale
    else:
        h = kfun
        kernel_width = width

    u = (np.arange(out_len, dtype=np.float64) + 0.5) / scale - 0.5
    left = np.floor(u - kernel_width / 2).astype(np.int64)
    p = int(np.ceil(kernel_width)) + 2
    indices = left[:, None] + np.arange(p)[None, :]
    weights = h(u[:, None] - indices)
    # Reference boundary semantics (util/imresize.py:113-126): field_of_view
    # is cast through np.uint BEFORE the weights are computed, so taps left of
    # the image get astronomically large distances -> weight 0, then the
    # remaining weights renormalize; taps right of the image keep their
    # kernel weight and mirror back into range.
    weights[indices < 0] = 0.0
    sums = np.sum(weights, axis=1, keepdims=True)
    sums[sums == 0] = 1.0
    weights = weights / sums
    mirror = np.concatenate([np.arange(in_len), np.arange(in_len - 1, -1, -1)])
    indices = mirror[np.mod(indices, mirror.shape[0])]

    # drop all-zero columns (MATLAB prunes them)
    keep = ~np.all(weights == 0, axis=0)
    return weights[:, keep], indices[:, keep]


def imresize(img: np.ndarray, scale: float = None, output_shape=None,
             kernel: str = "cubic", antialias: bool = True) -> np.ndarray:
    """Resize HxW or HxWxC. float inputs resized as-is; uint8 round-tripped
    like MATLAB (compute in float, clip, round back to uint8)."""
    if scale is None and output_shape is None:
        raise ValueError("need scale or output_shape")
    in_h, in_w = img.shape[:2]
    if output_shape is None:
        out_h, out_w = int(np.ceil(in_h * scale)), int(np.ceil(in_w * scale))
        scale_h = scale_w = float(scale)
    else:
        out_h, out_w = output_shape
        scale_h, scale_w = out_h / in_h, out_w / in_w

    x = img.astype(np.float64)
    squeeze = x.ndim == 2
    if squeeze:
        x = x[:, :, None]

    # resize along the dimension with the smaller scale first (MATLAB order)
    order = [0, 1] if scale_h <= scale_w else [1, 0]
    for dim in order:
        if dim == 0:
            w, idx = _contributions(in_h, out_h, scale_h, kernel, antialias)
            x = _resize_dim(x, w, idx, axis=0)
        else:
            w, idx = _contributions(in_w, out_w, scale_w, kernel, antialias)
            x = _resize_dim(x, w, idx, axis=1)

    if squeeze:
        x = x[:, :, 0]
    if np.issubdtype(img.dtype, np.integer):
        # MATLAB rounds HALF AWAY FROM ZERO (np.round is banker's: 126.5
        # -> 126, MATLAB -> 127) and saturates for every integer type —
        # without the clip, cubic ringing near edges would wrap (a small
        # negative becomes ~65535 in uint16).
        info = np.iinfo(img.dtype)
        rounded = np.where(x >= 0, np.floor(x + 0.5), np.ceil(x - 0.5))
        return np.clip(rounded, info.min, info.max).astype(img.dtype)
    return x.astype(img.dtype)


def _resize_dim(x: np.ndarray, weights: np.ndarray, indices: np.ndarray,
                axis: int) -> np.ndarray:
    """Apply per-output-pixel weighted gather along `axis` (0 or 1)."""
    if axis == 0:
        gathered = x[indices, :, :]           # (out, p, W, C)
        return np.einsum("op,opwc->owc", weights, gathered)
    gathered = x[:, indices, :]               # (H, out, p, C)
    return np.einsum("op,hopc->hoc", weights, gathered)


def np_imresize(img: np.ndarray, scale: float = None, output_shape=None,
                kernel: str = "cubic", antialias: bool = True) -> np.ndarray:
    """[0,1] float wrapper (reference exposes a np_imresize twin)."""
    return imresize(img, scale, output_shape, kernel, antialias)
