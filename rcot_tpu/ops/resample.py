"""Pixel-shuffle resamplers (NHWC).

Behavioral spec (reference: Net_Restormer.py:86-94,103-111):
- Downsample: 3x3 conv C -> C/2, then PixelUnshuffle(2)  => (2C, H/2, W/2)
- Upsample:   3x3 conv C -> 2C, then PixelShuffle(2)     => (C/2, 2H, 2W)

Channel ordering matches torch's pixel_(un)shuffle exactly so reference
checkpoints port bit-for-bit:
- pixel_unshuffle: out channel index = c * r^2 + i * r + j  (i,j spatial offsets)
- pixel_shuffle:   in  channel index = c * r^2 + i * r + j

These are pure reshape/transposes in NHWC — XLA compiles them to layout
changes fused into the adjacent conv, no data movement pass of their own.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .conv import conv2d, init_conv2d


def pixel_unshuffle(x: jax.Array, r: int = 2) -> jax.Array:
    """(B, H, W, C) -> (B, H/r, W/r, C*r^2), torch channel order."""
    b, h, w, c = x.shape
    x = x.reshape(b, h // r, r, w // r, r, c)
    # target channel index = c*r^2 + i*r + j -> order (c, i, j) in the new axis
    x = jnp.transpose(x, (0, 1, 3, 5, 2, 4))
    return x.reshape(b, h // r, w // r, c * r * r)


def pixel_shuffle(x: jax.Array, r: int = 2) -> jax.Array:
    """(B, H, W, C*r^2) -> (B, H*r, W*r, C), torch channel order."""
    b, h, w, crr = x.shape
    c = crr // (r * r)
    x = x.reshape(b, h, w, c, r, r)
    x = jnp.transpose(x, (0, 1, 4, 2, 5, 3))
    return x.reshape(b, h * r, w * r, c)


def init_downsample(key, n_feat: int, *, dtype=jnp.float32) -> dict:
    return {"conv": init_conv2d(key, n_feat, n_feat // 2, 3, bias=False, dtype=dtype)}


def downsample(p: dict, x: jax.Array) -> jax.Array:
    return pixel_unshuffle(conv2d(p["conv"], x), 2)


def init_upsample(key, n_feat: int, *, dtype=jnp.float32) -> dict:
    return {"conv": init_conv2d(key, n_feat, n_feat * 2, 3, bias=False, dtype=dtype)}


def upsample(p: dict, x: jax.Array) -> jax.Array:
    return pixel_shuffle(conv2d(p["conv"], x), 2)
