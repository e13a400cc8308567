"""Legacy MPRNet-style RCOT backbone (paper v1), NHWC pure functions.

Behavioral spec (reference: Net.py:179-216, superseded by the Restormer
backbone per README.md:94 but still the one the distributed pretrained
weights use): shallow conv+CAB stem; 3-level encoder/decoder of CAB
(channel-attention) blocks with bilinear-resize + 1x1-conv resampling
(n_feat=80, +48 per level -> dims 80/128/176, reduction=4); SAM supervised-
attention head producing the restored image; two-pass residual conditioning
`fea2_i = res_embedding_i + 0.8 * enc_i` (Net.py:212) with a SEPARATE
residual encoder (instantiated with csff=True, so the cross-stage-fusion 1x1
convs exist but are never called — Net.py:191 vs :211) and the SHARED decoder
+ SAM re-run.

Quirks kept for parity (param pin 6,842,689):
- ONE nn.PReLU() instance is shared by every CAB (Net.py:184) -> a single
  learnable scalar slope for the whole network;
- the residual encoder's unused CSFF convs are instantiated;
- resampling is torch bilinear align_corners=False WITHOUT antialias
  (jax.image.resize(..., antialias=False) matches).

The legacy critic (Net.py:219-303) is the same conv stack as the Restormer-
era F_net but with a fixed 512*8*8 -> 2048 head (patch 256): use
models.critic with CriticConfig(patch_size=256) — identical math, pin
80,920,257.
"""

from __future__ import annotations

import functools
from typing import Dict, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..utils import rng as rnglib
from ..ops.conv import conv2d, init_conv2d


def _resize_bilinear(x: jax.Array, h: int, w: int) -> jax.Array:
    """torch F.interpolate bilinear align_corners=False, no antialias."""
    b, _, _, c = x.shape
    return jax.image.resize(x, (b, h, w, c), method="linear", antialias=False)


@functools.lru_cache(maxsize=16)
def _bicubic_matrix(n_in: int, scale: int, a: float = -0.75) -> np.ndarray:
    """(n_in*scale, n_in) resize matrix reproducing torch F.interpolate
    mode='bicubic' align_corners=False: half-pixel mapping, Keys cubic with
    a=-0.75 (jax.image.resize's 'cubic' uses a=-0.5 — up to 0.068 off on
    [0,1] inputs, which would feed ported SR checkpoints materially
    different inputs than they were trained on), border taps clamped."""
    n_out = n_in * scale
    m = np.zeros((n_out, n_in), np.float32)
    for o in range(n_out):
        i = (o + 0.5) / scale - 0.5
        base = int(np.floor(i))
        for t in range(base - 1, base + 3):
            d = abs(i - t)
            if d <= 1:
                wgt = (a + 2) * d ** 3 - (a + 3) * d ** 2 + 1
            elif d < 2:
                wgt = a * d ** 3 - 5 * a * d ** 2 + 8 * a * d - 4 * a
            else:
                continue
            m[o, min(max(t, 0), n_in - 1)] += wgt
    return m


def _upsample_bicubic_torch(x: jax.Array, scale: int) -> jax.Array:
    """Separable torch-parity bicubic upsample of (B,H,W,C) by an integer
    scale (the legacy SR pre-upsample, Net.py:182-183)."""
    _, h, w, _ = x.shape
    mh = jnp.asarray(_bicubic_matrix(h, scale), x.dtype)
    mw = jnp.asarray(_bicubic_matrix(w, scale), x.dtype)
    y = jnp.einsum("oh,bhwc->bowc", mh, x)
    return jnp.einsum("pw,bowc->bopc", mw, y)


def prelu(x: jax.Array, a: jax.Array) -> jax.Array:
    return jnp.maximum(x, 0) + a.astype(x.dtype) * jnp.minimum(x, 0)


# ------------------------------------------------------------ blocks

def init_cab(key, n_feat: int, *, reduction: int = 4, kernel: int = 3,
             bias: bool = False, dtype=jnp.float32) -> dict:
    k1, k2, k3, k4 = rnglib.split(key, 4)
    return {
        "conv1": init_conv2d(k1, n_feat, n_feat, kernel, bias=bias, dtype=dtype),
        "conv2": init_conv2d(k2, n_feat, n_feat, kernel, bias=bias, dtype=dtype),
        "ca_down": init_conv2d(k3, n_feat, n_feat // reduction, 1, bias=bias, dtype=dtype),
        "ca_up": init_conv2d(k4, n_feat // reduction, n_feat, 1, bias=bias, dtype=dtype),
    }


def cab(p: dict, x: jax.Array, a: jax.Array) -> jax.Array:
    """Channel-attention block (reference: Net.py:57-72)."""
    res = conv2d(p["conv2"], prelu(conv2d(p["conv1"], x), a))
    # CALayer (Net.py:36-52): global-avg-pool -> 1x1 down -> relu -> 1x1 up -> sigmoid
    y = jnp.mean(res, axis=(1, 2), keepdims=True)
    y = jax.nn.sigmoid(conv2d(p["ca_up"], jax.nn.relu(conv2d(p["ca_down"], y))))
    return res * y + x


def init_sam(key, n_feat: int, *, kernel: int = 1, bias: bool = False,
             dtype=jnp.float32) -> dict:
    k1, k2, k3 = rnglib.split(key, 3)
    return {
        "conv1": init_conv2d(k1, n_feat, n_feat, kernel, bias=bias, dtype=dtype),
        "conv2": init_conv2d(k2, n_feat, 3, kernel, bias=bias, dtype=dtype),
        "conv3": init_conv2d(k3, 3, n_feat, kernel, bias=bias, dtype=dtype),
    }


def sam(p: dict, x: jax.Array, x_img: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """Supervised attention module (reference: Net.py:19-32)."""
    x1 = conv2d(p["conv1"], x, padding=0)
    img = conv2d(p["conv2"], x, padding=0) + x_img
    x2 = jax.nn.sigmoid(conv2d(p["conv3"], img, padding=0))
    return x1 * x2 + x, img


# ------------------------------------------------------------ encoder/decoder

def _dims(n_feat: int, s: int) -> Tuple[int, int, int]:
    return n_feat, n_feat + s, n_feat + 2 * s


def init_encoder(key, n_feat: int, s: int, *, csff: bool, bias: bool = False,
                 dtype=jnp.float32) -> dict:
    d1, d2, d3 = _dims(n_feat, s)
    ks = iter(rnglib.split(key, 24))
    p = {
        "level1": [init_cab(next(ks), d1, dtype=dtype) for _ in range(2)],
        "level2": [init_cab(next(ks), d2, dtype=dtype) for _ in range(2)],
        "level3": [init_cab(next(ks), d3, dtype=dtype) for _ in range(2)],
        "down12": init_conv2d(next(ks), d1, d2, 1, bias=False, dtype=dtype),
        "down23": init_conv2d(next(ks), d2, d3, 1, bias=False, dtype=dtype),
    }
    if csff:
        # instantiated-but-uncalled cross-stage-fusion convs (Net.py:90-97,211)
        for i, d in enumerate((d1, d2, d3), start=1):
            p[f"csff_enc{i}"] = init_conv2d(next(ks), d, d, 1, bias=bias, dtype=dtype)
            p[f"csff_dec{i}"] = init_conv2d(next(ks), d, d, 1, bias=bias, dtype=dtype)
    return p


def encoder(p: dict, x: jax.Array, a: jax.Array) -> List[jax.Array]:
    e1 = x
    for blk in p["level1"]:
        e1 = cab(blk, e1, a)
    h, w = e1.shape[1] // 2, e1.shape[2] // 2
    x2 = conv2d(p["down12"], _resize_bilinear(e1, h, w), padding=0)
    e2 = x2
    for blk in p["level2"]:
        e2 = cab(blk, e2, a)
    x3 = conv2d(p["down23"], _resize_bilinear(e2, h // 2, w // 2), padding=0)
    e3 = x3
    for blk in p["level3"]:
        e3 = cab(blk, e3, a)
    return [e1, e2, e3]


def init_decoder(key, n_feat: int, s: int, *, dtype=jnp.float32) -> dict:
    d1, d2, d3 = _dims(n_feat, s)
    ks = iter(rnglib.split(key, 12))
    return {
        "level1": [init_cab(next(ks), d1, dtype=dtype) for _ in range(2)],
        "level2": [init_cab(next(ks), d2, dtype=dtype) for _ in range(2)],
        "level3": [init_cab(next(ks), d3, dtype=dtype) for _ in range(2)],
        "skip_attn1": init_cab(next(ks), d1, dtype=dtype),
        "skip_attn2": init_cab(next(ks), d2, dtype=dtype),
        "up21": init_conv2d(next(ks), d2, d1, 1, bias=False, dtype=dtype),
        "up32": init_conv2d(next(ks), d3, d2, 1, bias=False, dtype=dtype),
    }


def decoder(p: dict, outs: List[jax.Array], a: jax.Array) -> List[jax.Array]:
    e1, e2, e3 = outs
    d3 = e3
    for blk in p["level3"]:
        d3 = cab(blk, d3, a)
    up = conv2d(p["up32"], _resize_bilinear(d3, e2.shape[1], e2.shape[2]), padding=0)
    d2 = up + cab(p["skip_attn2"], e2, a)
    for blk in p["level2"]:
        d2 = cab(blk, d2, a)
    up = conv2d(p["up21"], _resize_bilinear(d2, e1.shape[1], e1.shape[2]), padding=0)
    d1 = up + cab(p["skip_attn1"], e1, a)
    for blk in p["level1"]:
        d1 = cab(blk, d1, a)
    return [d1, d2, d3]


# ------------------------------------------------------------ T_net (legacy)

def init_mprnet_tnet(key, *, n_feat: int = 80, scale_unetfeats: int = 48,
                     dtype=jnp.float32) -> Dict:
    key = rnglib.ensure_host(key)
    ks = iter(rnglib.split(key, 8))
    return {
        "prelu_a": np.full((1,), 0.25, np.dtype(dtype)),  # ONE shared slope
        "shallow_feat1": {
            "conv": init_conv2d(next(ks), 3, n_feat, 3, bias=False, dtype=dtype),
            "cab": init_cab(next(ks), n_feat, dtype=dtype),
        },
        "res_shallow_feat1": {
            "conv": init_conv2d(next(ks), 3, n_feat, 3, bias=False, dtype=dtype),
            "cab": init_cab(next(ks), n_feat, dtype=dtype),
        },
        "stage1_encoder": init_encoder(next(ks), n_feat, scale_unetfeats,
                                       csff=False, dtype=dtype),
        "stage1_resencoder": init_encoder(next(ks), n_feat, scale_unetfeats,
                                          csff=True, dtype=dtype),
        "stage1_decoder": init_decoder(next(ks), n_feat, scale_unetfeats, dtype=dtype),
        "sam12": init_sam(next(ks), n_feat, dtype=dtype),
    }


def apply_mprnet_tnet(p: Dict, deg_img: jax.Array, *, sr_scale: int = 0,
                      residual_cond_scale: float = 0.8
                      ) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Two-pass legacy forward (reference: Net.py:196-216).

    sr_scale > 0 bicubic-upsamples the input first (SR mode, Net.py:182-183).
    Returns (out2, out1, res) like the Restormer T_net.
    """
    if sr_scale:
        deg_img = _upsample_bicubic_torch(deg_img, sr_scale)
    a = p["prelu_a"]

    def shallow(sp, x):
        return cab(sp["cab"], conv2d(sp["conv"], x), a)

    fea = shallow(p["shallow_feat1"], deg_img)
    enc = encoder(p["stage1_encoder"], fea, a)
    dec = decoder(p["stage1_decoder"], enc, a)
    _, out1 = sam(p["sam12"], dec[0], deg_img)

    res = deg_img - out1
    rfea = shallow(p["res_shallow_feat1"], res)
    remb = encoder(p["stage1_resencoder"], rfea, a)
    fea2 = [r + residual_cond_scale * e for r, e in zip(remb, enc)]
    dec2 = decoder(p["stage1_decoder"], fea2, a)
    _, out2 = sam(p["sam12"], dec2[0], deg_img)
    return out2, out1, res
