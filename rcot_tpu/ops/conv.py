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
