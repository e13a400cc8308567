"""GDFN: Gated-DConv Feed-forward Network.

Behavioral spec (reference: Net_Restormer.py:67-85): 1x1 conv expanding to
2 * hidden where hidden = int(dim * ffn_expansion_factor); 3x3 depthwise conv;
split in two; `gelu(x1) * x2` (exact erf gelu, torch default); 1x1 project
back to dim.

On TPU the 1x1 convs are MXU matmuls and XLA fuses the gate elementwise chain
into the depthwise conv's output; the hidden size int(48*2.66)=127 etc. is kept
for parameter parity even though it is not lane-aligned (a padded fast-path
variant is a documented option, not the default).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..utils import rng as rnglib
from .conv import conv2d, init_conv2d


def hidden_features(dim: int, ffn_expansion_factor: float,
                    multiple: int = 1) -> int:
    """Reference sizing int(dim * factor) (Net_Restormer.py:70), optionally
    rounded UP to a multiple — the lane-aligned 'turbo' configs round to 128
    so the depthwise conv channel count (2*hidden) tiles the TPU's 128-lane
    registers without XLA's data-formatting copies (BENCH.md profile)."""
    hid = int(dim * ffn_expansion_factor)
    return -(-hid // multiple) * multiple


def init_gdfn(key, dim: int, ffn_expansion_factor: float, *, bias: bool,
              hidden_multiple: int = 1, dtype=jnp.float32) -> dict:
    hid = hidden_features(dim, ffn_expansion_factor, hidden_multiple)
    k1, k2, k3 = rnglib.split(key, 3)
    return {
        "proj_in": init_conv2d(k1, dim, hid * 2, 1, bias=bias, dtype=dtype),
        "dw": init_conv2d(k2, hid * 2, hid * 2, 3, groups=hid * 2, bias=bias, dtype=dtype),
        "proj_out": init_conv2d(k3, hid, dim, 1, bias=bias, dtype=dtype),
    }


def gdfn(p: dict, x: jax.Array) -> jax.Array:
    from . import dispatch
    from .conv import depthwise3x3_shifts

    if (dispatch.pallas_enabled() and dispatch.pallas_fused_on()
            and "b" not in p["proj_in"] and not dispatch.ablate("dwconv")):
        # whole GDFN in ONE Pallas kernel: the 2*hidden-wide intermediates
        # never touch HBM (ops/pallas_fused.py; ~34% of the minimax
        # iteration is the XLA dwconv chain this replaces — BENCH.md)
        from .pallas_fused import gdfn_fused
        return gdfn_fused(x,
                          p["proj_in"]["w"][0, 0].astype(x.dtype),
                          p["dw"]["w"][:, :, 0, :].astype(x.dtype),
                          p["proj_out"]["w"][0, 0].astype(x.dtype),
                          interpret=dispatch.pallas_interpret())

    h = conv2d(p["proj_in"], x)
    if dispatch.ablate("dwconv"):
        pass  # measurement-only: attribute the dwconv's in-model cost
    elif (dispatch.pallas_enabled() and dispatch.pallas_dwconv_on()
            and "b" not in p["dw"]):
        # bias-free kernel — bias=True models take the conv path instead of
        # silently dropping the depthwise bias (see ops/attention.py twin)
        from .pallas_dwconv import dwconv3x3_pallas
        h = dwconv3x3_pallas(h, p["dw"]["w"][:, :, 0, :],
                             dispatch.pallas_interpret())
    elif dispatch.dwconv_shifts_on():
        h = depthwise3x3_shifts(p["dw"], h)
    else:
        h = conv2d(p["dw"], h, groups=h.shape[-1])
    x1, x2 = jnp.split(h, 2, axis=-1)
    return conv2d(p["proj_out"], jax.nn.gelu(x1, approximate=False) * x2)
