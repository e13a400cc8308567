"""F_net: the OT potential / WGAN critic (NHWC, pure fn).

Behavioral spec (reference: Net_Restormer.py:436-522): ten convs with
LeakyReLU(0.2) — 5x5 s1 stem then alternating 3x3 s1 / 4x4 s2 stages,
64->64->128->128->256->256->512->512->512->512 channels (last four bias-free),
five stride-2 halvings total; conv weights init N(0, 0.02)
(Net_Restormer.py:501-503), biases and FC layers keep torch defaults. Head:
flatten -> fc(num_fea -> num_fea/4) -> fc1(-> 64) -> LeakyReLU -> fc2(-> 1),
where num_fea = patch_size^2 / 2 = 512 * (patch/32)^2 — the critic is
patch-size-bound and crashes on any other input size (SURVEY.md §2.2 #13).

Ours adds a resolution-agnostic `head="pooled"` variant (global average pool
to 512 features before the FCs); `head="flatten"` reproduces the reference
math exactly (param pin: 30,588,609 at patch 128). NOTE the reference applies
NO nonlinearity between fc and fc1 (Net_Restormer.py:513-515) — kept as-is.

Flatten order is NHWC-natural (h, w, c); the torch checkpoint porter permutes
fc's input rows from torch's (c, h, w) order (compat/torch_port.py).
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp

from ..utils import rng as rnglib
from ..ops.conv import conv2d, init_conv2d, init_linear, linear
from ..utils.config import CriticConfig

# (cin, cout, kernel, stride, bias)
_CONV_SPECS = [
    (3, 64, 5, 1, True),
    (64, 64, 4, 2, True),
    (64, 128, 3, 1, True),
    (128, 128, 4, 2, True),
    (128, 256, 3, 1, True),
    (256, 256, 4, 2, True),
    (256, 512, 3, 1, False),
    (512, 512, 4, 2, False),
    (512, 512, 3, 1, False),
    (512, 512, 4, 2, False),
]


def init_fnet(key, cfg: CriticConfig, dtype=jnp.float32) -> Dict:
    key = rnglib.ensure_host(key)
    ks = iter(rnglib.split(key, len(_CONV_SPECS) + 3))
    convs = []
    for cin, cout, k, _s, bias in _CONV_SPECS:
        if cin == 3:
            cin = cfg.in_channels
        convs.append(init_conv2d(next(ks), cin, cout, k, bias=bias,
                                 weight_std=0.02, dtype=dtype))
    p: Dict = {"convs": convs}
    if cfg.head == "flatten":
        if cfg.patch_size % 32:
            # the reference formula num_fea = patch^2/2 equals the conv
            # stack's true 512*(patch/32)^2 output ONLY at multiples of 32;
            # anywhere else init would silently build a mis-sized fc and
            # the first forward dies with an opaque dot_general error
            raise ValueError(
                f"flatten critic head requires patch_size % 32 == 0 "
                f"(got {cfg.patch_size}); use head='pooled' for arbitrary "
                "sizes (SURVEY.md §2.2 #13)")
        num_fea = cfg.patch_size * cfg.patch_size // 2
        mid = cfg.fc_mid if cfg.fc_mid is not None else num_fea // 4
        p["fc"] = init_linear(next(ks), num_fea, mid, dtype=dtype)
        p["fc1"] = init_linear(next(ks), mid, 64, dtype=dtype)
    elif cfg.head == "pooled":
        if cfg.fc_mid is not None:
            raise ValueError(
                "fc_mid only applies to the flatten head (the pooled head's "
                "mid width is fixed at 128); remove it or use head='flatten'")
        p["fc"] = init_linear(next(ks), 512, 128, dtype=dtype)
        p["fc1"] = init_linear(next(ks), 128, 64, dtype=dtype)
    else:
        raise ValueError(f"unknown critic head {cfg.head!r}")
    p["fc2"] = init_linear(next(ks), 64, 1, dtype=dtype)
    return p


def _leaky(x: jax.Array) -> jax.Array:
    return jax.nn.leaky_relu(x, negative_slope=0.2)


def apply_fnet(p: Dict, x: jax.Array, cfg: CriticConfig) -> jax.Array:
    """x: (B, H, W, C) -> (B,) scalar potential per image.

    The stride-2 convs use XLA's strided lowering directly: a space-to-depth
    rewrite (RCOT_CRITIC_S2D, rounds 2-3) was built, parity-tested, and
    measured TWICE — round 2's untagged -1.1 ms was refuted by round 3's
    tagged same-session A/B (+3.5 ms, BENCH.md "critic S2D re-measured"),
    so the knob and the op were removed.
    """
    h = x
    for params, (_cin, _cout, k, s, _b) in zip(p["convs"], _CONV_SPECS):
        # torch padding: 2 for the 5x5 stem, 1 elsewhere (both 3x3-s1 and 4x4-s2).
        pad = 2 if k == 5 else 1
        h = _leaky(conv2d(params, h, stride=s, padding=pad))
    if cfg.head == "flatten":
        feat = h.reshape(h.shape[0], -1)
    elif cfg.head == "pooled":
        feat = jnp.mean(h, axis=(1, 2))
    else:  # mirror init_fnet: a typo'd head (e.g. from checkpoint metadata)
        raise ValueError(f"unknown critic head {cfg.head!r}")
    out = linear(p["fc1"], linear(p["fc"], feat))
    out = linear(p["fc2"], _leaky(out))
    return out[:, 0]
