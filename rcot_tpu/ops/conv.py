"""NHWC convolution / linear primitives.

TPU-native layout: activations NHWC, weights HWIO. 1x1 convolutions lower to
MXU matmuls; 3x3 depthwise convolutions use `feature_group_count`, which XLA
maps onto the VPU/MXU without im2col blowup.

Functional param convention: every layer is a dict of arrays; `init_*` builds
it, `*` applies it. No module objects, no mutable state.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from ..utils import rng as rnglib
from . import initializers as init

_DIMSPEC = ("NHWC", "HWIO", "NHWC")


def init_conv2d(key, cin: int, cout: int, kernel: int = 3, *, groups: int = 1,
                bias: bool = False, weight_std: Optional[float] = None,
                dtype=jnp.float32) -> dict:
    """Conv2d params. `weight_std` switches to N(0, std) init (critic convs)."""
    kw, kb = rnglib.split(key)
    if weight_std is not None:
        w = init.normal_conv_weight(kw, kernel, kernel, cin, cout, groups, weight_std, dtype)
    else:
        w = init.torch_conv_weight(kw, kernel, kernel, cin, cout, groups, dtype)
    p = {"w": w}
    if bias:
        p["b"] = init.torch_conv_bias(kb, kernel, kernel, cin, cout, groups, dtype)
    return p


def conv2d(p: dict, x: jax.Array, *, stride: int = 1, padding="SAME",
           groups: int = 1) -> jax.Array:
    """NHWC conv. `padding` is 'SAME', 'VALID', or an int (symmetric)."""
    if isinstance(padding, int):
        padding = [(padding, padding), (padding, padding)]
    y = jax.lax.conv_general_dilated(
        x, p["w"].astype(x.dtype),
        window_strides=(stride, stride),
        padding=padding,
        dimension_numbers=_DIMSPEC,
        feature_group_count=groups,
    )
    if "b" in p:
        y = y + p["b"].astype(y.dtype)
    return y


def depthwise3x3_shifts(p: dict, x: jax.Array) -> jax.Array:
    """3x3 SAME depthwise conv as 9 shifted multiply-adds (no conv op).

    XLA's TPU conv lowering wraps every depthwise conv in 'data formatting'
    copies (im2col-style operand reshuffles) that profiling shows cost more
    than the math, especially at non-128-aligned channel counts (the GDFN
    hiddens 254/510/1020/2042). Expressed as shifts the whole thing becomes
    one VPU fusion with neighbor reads — and its backward is shifts again.
    Numerically identical to conv2d(..., groups=C).
    """
    w = p["w"]  # (3, 3, 1, C)
    padded = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    _, h, w_dim, _ = x.shape
    out = None
    for dy in range(3):
        for dx in range(3):
            tap = jax.lax.slice(
                padded, (0, dy, dx, 0),
                (padded.shape[0], dy + h, dx + w_dim, padded.shape[3]))
            term = tap * w[dy, dx, 0].astype(x.dtype)
            out = term if out is None else out + term
    if "b" in p:
        out = out + p["b"].astype(out.dtype)
    return out


def init_linear(key, fin: int, fout: int, *, bias: bool = True,
                dtype=jnp.float32) -> dict:
    kw, kb = rnglib.split(key)
    p = {"w": init.torch_linear_weight(kw, fin, fout, dtype)}
    if bias:
        p["b"] = init.torch_linear_bias(kb, fin, fout, dtype)
    return p


def linear(p: dict, x: jax.Array) -> jax.Array:
    y = jnp.dot(x, p["w"].astype(x.dtype), preferred_element_type=x.dtype)
    if "b" in p:
        y = y + p["b"].astype(y.dtype)
    return y
