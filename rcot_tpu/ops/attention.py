"""MDTA: Multi-DConv-Head Transposed (channel) Attention.

Behavioral spec (reference: Net_Restormer.py:19-50): QKV by 1x1 conv + 3x3
depthwise conv; per head, L2-normalize Q and K along the *spatial* axis; the
attention matrix is channel-by-channel, `softmax((Q @ K^T) * temperature)`
with shape (heads, c, c) — linear in pixels, O(C^2 * HW) FLOPs.

TPU-first design: activations stay NHWC; the head split is a reshape of the
trailing channel dim (free); the two attention matmuls are (c, HW) @ (HW, c)
and (c, c) @ (c, HW), both MXU-shaped with HW on the 128-lane axis. A fused
Pallas kernel for normalize+attn+softmax+apply lives in ops/pallas_mdta.py;
this file is the pure-jnp reference twin.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..utils import rng as rnglib
from .conv import conv2d, init_conv2d

_L2_EPS = 1e-12  # torch F.normalize default eps


def init_mdta(key, dim: int, num_heads: int, *, bias: bool, dtype=jnp.float32) -> dict:
    k1, k2, k3 = rnglib.split(key, 3)
    return {
        "temperature": np.ones((num_heads, 1, 1), np.dtype(dtype)),
        "qkv": init_conv2d(k1, dim, dim * 3, 1, bias=bias, dtype=dtype),
        "qkv_dw": init_conv2d(k2, dim * 3, dim * 3, 3, groups=dim * 3, bias=bias, dtype=dtype),
        "proj": init_conv2d(k3, dim, dim, 1, bias=bias, dtype=dtype),
    }


def _l2_normalize(x: jax.Array, axis: int) -> jax.Array:
    # torch F.normalize: x / max(||x||_2, eps)
    norm = jnp.sqrt(jnp.sum(jnp.square(x), axis=axis, keepdims=True))
    return x / jnp.maximum(norm, _L2_EPS)


def mdta_attend(q: jax.Array, k: jax.Array, v: jax.Array,
                temperature: jax.Array) -> jax.Array:
    """Core transposed attention on (B, heads, c, HW) tensors -> same shape."""
    q = _l2_normalize(q, axis=-1)
    k = _l2_normalize(k, axis=-1)
    attn = jnp.einsum("bhcn,bhdn->bhcd", q, k,
                      preferred_element_type=jnp.float32)
    attn = attn * temperature.astype(attn.dtype)
    attn = jax.nn.softmax(attn, axis=-1).astype(v.dtype)
    return jnp.einsum("bhcd,bhdn->bhcn", attn, v,
                      preferred_element_type=jnp.float32).astype(v.dtype)


def mdta_core(p: dict, qkv: jax.Array, num_heads: int) -> jax.Array:
    """Attention core given the post-dwconv qkv tensor: head split,
    normalize/attend/softmax, merge back to NHWC — everything between the
    fused block-head and block-tail kernels (ops/pallas_block.py)."""
    from . import dispatch

    # the explicit opt-in MDTA kernel (default OFF) wins over the default-ON
    # gram tier so RCOT_PALLAS_MDTA=1 remains A/B-able without also having
    # to set RCOT_PALLAS_GRAM=0
    if (dispatch.pallas_enabled() and dispatch.pallas_gram_on()
            and not dispatch.pallas_mdta_on()
            and not dispatch.ablate("attn_core")):
        from .pallas_gram import mdta_core_gram
        return mdta_core_gram(p["temperature"], qkv, num_heads,
                              interpret=dispatch.pallas_interpret())

    b, h, w, c3 = qkv.shape
    c = c3 // 3
    ch = c // num_heads
    qkv = qkv.reshape(b, h * w, 3, num_heads, ch)
    qkv = jnp.transpose(qkv, (2, 0, 3, 4, 1))  # (3, B, heads, ch, HW)
    temp = jnp.asarray(p["temperature"])
    if dispatch.ablate("attn_core"):
        out = qkv[2]  # measurement-only: keep transposes, skip the math
    elif dispatch.pallas_enabled() and dispatch.pallas_mdta_on():
        from .pallas_mdta import mdta_attend_pallas
        out = mdta_attend_pallas(qkv[0], qkv[1], qkv[2], temp,
                                 dispatch.pallas_interpret())
    else:
        out = mdta_attend(qkv[0], qkv[1], qkv[2], temp)
    return jnp.transpose(out, (0, 3, 1, 2)).reshape(b, h, w, c)


def mdta_qkv(p: dict, x: jax.Array) -> jax.Array:
    """The qkv half of MDTA (1x1 projection + 3x3 depthwise), tier-dispatched
    — shared by mdta() and the block-tail-only composition
    (models/restormer.py transformer_block, mode 'tail')."""
    from . import dispatch

    c = x.shape[-1]
    from .conv import depthwise3x3_shifts
    if (dispatch.pallas_enabled() and dispatch.pallas_fused_on()
            and "b" not in p["qkv"] and not dispatch.ablate("dwconv")):
        # 1x1 qkv projection + its depthwise conv in one Pallas kernel
        # (ops/pallas_fused.py) — the 3C-wide qkv tensor is built in VMEM
        from .pallas_fused import conv1x1_dw_fused
        return conv1x1_dw_fused(x, p["qkv"]["w"][0, 0].astype(x.dtype),
                                p["qkv_dw"]["w"][:, :, 0, :].astype(x.dtype),
                                interpret=dispatch.pallas_interpret())
    if dispatch.ablate("dwconv"):
        return conv2d(p["qkv"], x)  # measurement-only (ops/dispatch.py)
    if (dispatch.pallas_enabled() and dispatch.pallas_dwconv_on()
            and "b" not in p["qkv_dw"]):
        # the kernel is bias-free (pallas_dwconv.py) — with bias=True models
        # fall through to the conv path rather than silently dropping it
        from .pallas_dwconv import dwconv3x3_pallas
        return dwconv3x3_pallas(conv2d(p["qkv"], x),
                                p["qkv_dw"]["w"][:, :, 0, :],
                                dispatch.pallas_interpret())
    if dispatch.dwconv_shifts_on():
        return depthwise3x3_shifts(p["qkv_dw"], conv2d(p["qkv"], x))
    return conv2d(p["qkv_dw"], conv2d(p["qkv"], x), groups=3 * c)


def mdta(p: dict, x: jax.Array, num_heads: int) -> jax.Array:
    """x: (B, H, W, C) -> (B, H, W, C).

    Layout note (measured on TPU v5e): the explicit transpose to
    (B, heads, ch, N) before the attention einsums is the FAST formulation
    in-graph. "Transpose-free" channel-last variants (head-batched
    'bnhc,bnhd->bhcd' einsums, or a full-C Gram + block-diagonal attention)
    look faster in isolated microbenchmarks — where XLA may pick custom
    parameter layouts — but composed inside the model they trigger
    pathological relayouts (~60-100x slower whole-model forward: 69ms vs
    4.6-7.3s). Keep the transposes; XLA fuses them into the surrounding ops.
    """
    from . import dispatch

    c = x.shape[-1]
    qkv = mdta_qkv(p, x)
    if dispatch.ablate("attn_all"):
        # measurement-only: skip the head transposes AND the attention core
        # (isolates transpose cost = attn_all share minus attn_core share)
        return conv2d(p["proj"], qkv[..., :c])
    return conv2d(p["proj"], mdta_core(p, qkv, num_heads))
