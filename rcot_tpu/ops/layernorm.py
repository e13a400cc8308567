"""Channel-last LayerNorms (BiasFree / WithBias).

The reference applies LayerNorm over the channel dim by reshaping NCHW ->
(B, HW, C) and back (reference: Net_Restormer.py:96-101,158-200). In NHWC the
channel is already last, so these are single fused VPU passes — no reshape.

Semantics pinned to the reference:
- variance is biased (unbiased=False), eps=1e-5 inside the sqrt;
- BiasFree: x / sqrt(var + eps) * weight          (Net_Restormer.py:170-172)
- WithBias: (x - mean) / sqrt(var + eps) * w + b  (Net_Restormer.py:186-189)

Note BiasFree still subtracts nothing but uses the *variance around the mean*
(torch `var`), not the raw second moment.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

_EPS = 1e-5


def init_layernorm(dim: int, *, bias: bool, dtype=jnp.float32) -> dict:
    # numpy constants: eager jnp constants would each dispatch to the device.
    p = {"w": np.ones((dim,), np.dtype(dtype))}
    if bias:
        p["b"] = np.zeros((dim,), np.dtype(dtype))
    return p


def layernorm(p: dict, x: jax.Array) -> jax.Array:
    """Channel-last LN over the trailing dim. WithBias iff params contain 'b'."""
    from . import dispatch
    if dispatch.ablate("ln"):
        return x  # measurement-only (ops/dispatch.py)
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
    inv = jax.lax.rsqrt(var + _EPS)
    if "b" in p:
        y = (xf - mean) * inv * p["w"].astype(jnp.float32) + p["b"].astype(jnp.float32)
    else:
        y = xf * inv * p["w"].astype(jnp.float32)
    return y.astype(x.dtype)
