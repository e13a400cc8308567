"""InceptionV3 (FID variant) feature extractor in JAX (NHWC).

Re-implements the pool3 feature path of pytorch-fid's InceptionV3 (the
reference vendors its score code at fid_score.py and depends on
pytorch_fid.inception for the network): bilinear resize to 299, [0,1]->[-1,1]
normalization, the Inception A/B/C/D/E tower, global average pool -> 2048-d.
FID-variant pooling quirks are kept: average pools use
count_include_pad=False, and the second InceptionE block uses MAX pooling in
its pool branch.

Weights: BatchNorms are FOLDED into the convolutions at port time
(tools/port_inception.py converts a torchvision/pytorch-fid state_dict to the
npz this module loads). Without a weights file the net falls back to a
deterministic surrogate init — FID values are then only comparable to other
values from the same surrogate (absolute parity with published FID requires
the ported weights); callers get a loud warning.
"""

from __future__ import annotations

import os
import warnings
import zlib
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

BN_EPS = 1e-3  # torchvision InceptionV3 BatchNorm eps


# ------------------------------------------------------------ architecture
# Each conv spec: (name, cin, cout, (kh, kw), (sh, sw), (ph, pw))

def _conv(name, cin, cout, k, s=(1, 1), p=(0, 0)):
    kh, kw = (k, k) if isinstance(k, int) else k
    return (name, cin, cout, (kh, kw), s if isinstance(s, tuple) else (s, s),
            p if isinstance(p, tuple) else (p, p))


def _inception_a(prefix: str, cin: int, pool_features: int) -> List:
    return [
        _conv(f"{prefix}.branch1x1", cin, 64, 1),
        _conv(f"{prefix}.branch5x5_1", cin, 48, 1),
        _conv(f"{prefix}.branch5x5_2", 48, 64, 5, 1, (2, 2)),
        _conv(f"{prefix}.branch3x3dbl_1", cin, 64, 1),
        _conv(f"{prefix}.branch3x3dbl_2", 64, 96, 3, 1, (1, 1)),
        _conv(f"{prefix}.branch3x3dbl_3", 96, 96, 3, 1, (1, 1)),
        _conv(f"{prefix}.branch_pool", cin, pool_features, 1),
    ]


def _inception_b(prefix: str, cin: int) -> List:
    return [
        _conv(f"{prefix}.branch3x3", cin, 384, 3, 2),
        _conv(f"{prefix}.branch3x3dbl_1", cin, 64, 1),
        _conv(f"{prefix}.branch3x3dbl_2", 64, 96, 3, 1, (1, 1)),
        _conv(f"{prefix}.branch3x3dbl_3", 96, 96, 3, 2),
    ]


def _inception_c(prefix: str, cin: int, c7: int) -> List:
    return [
        _conv(f"{prefix}.branch1x1", cin, 192, 1),
        _conv(f"{prefix}.branch7x7_1", cin, c7, 1),
        _conv(f"{prefix}.branch7x7_2", c7, c7, (1, 7), 1, (0, 3)),
        _conv(f"{prefix}.branch7x7_3", c7, 192, (7, 1), 1, (3, 0)),
        _conv(f"{prefix}.branch7x7dbl_1", cin, c7, 1),
        _conv(f"{prefix}.branch7x7dbl_2", c7, c7, (7, 1), 1, (3, 0)),
        _conv(f"{prefix}.branch7x7dbl_3", c7, c7, (1, 7), 1, (0, 3)),
        _conv(f"{prefix}.branch7x7dbl_4", c7, c7, (7, 1), 1, (3, 0)),
        _conv(f"{prefix}.branch7x7dbl_5", c7, 192, (1, 7), 1, (0, 3)),
        _conv(f"{prefix}.branch_pool", cin, 192, 1),
    ]


def _inception_d(prefix: str, cin: int) -> List:
    return [
        _conv(f"{prefix}.branch3x3_1", cin, 192, 1),
        _conv(f"{prefix}.branch3x3_2", 192, 320, 3, 2),
        _conv(f"{prefix}.branch7x7x3_1", cin, 192, 1),
        _conv(f"{prefix}.branch7x7x3_2", 192, 192, (1, 7), 1, (0, 3)),
        _conv(f"{prefix}.branch7x7x3_3", 192, 192, (7, 1), 1, (3, 0)),
        _conv(f"{prefix}.branch7x7x3_4", 192, 192, 3, 2),
    ]


def _inception_e(prefix: str, cin: int) -> List:
    return [
        _conv(f"{prefix}.branch1x1", cin, 320, 1),
        _conv(f"{prefix}.branch3x3_1", cin, 384, 1),
        _conv(f"{prefix}.branch3x3_2a", 384, 384, (1, 3), 1, (0, 1)),
        _conv(f"{prefix}.branch3x3_2b", 384, 384, (3, 1), 1, (1, 0)),
        _conv(f"{prefix}.branch3x3dbl_1", cin, 448, 1),
        _conv(f"{prefix}.branch3x3dbl_2", 448, 384, 3, 1, (1, 1)),
        _conv(f"{prefix}.branch3x3dbl_3a", 384, 384, (1, 3), 1, (0, 1)),
        _conv(f"{prefix}.branch3x3dbl_3b", 384, 384, (3, 1), 1, (1, 0)),
        _conv(f"{prefix}.branch_pool", cin, 192, 1),
    ]


def conv_specs() -> List:
    """All convolutions of the pool3 path, in torchvision naming."""
    specs = [
        _conv("Conv2d_1a_3x3", 3, 32, 3, 2),
        _conv("Conv2d_2a_3x3", 32, 32, 3),
        _conv("Conv2d_2b_3x3", 32, 64, 3, 1, (1, 1)),
        _conv("Conv2d_3b_1x1", 64, 80, 1),
        _conv("Conv2d_4a_3x3", 80, 192, 3),
    ]
    specs += _inception_a("Mixed_5b", 192, 32)
    specs += _inception_a("Mixed_5c", 256, 64)
    specs += _inception_a("Mixed_5d", 288, 64)
    specs += _inception_b("Mixed_6a", 288)
    specs += _inception_c("Mixed_6b", 768, 128)
    specs += _inception_c("Mixed_6c", 768, 160)
    specs += _inception_c("Mixed_6d", 768, 160)
    specs += _inception_c("Mixed_6e", 768, 192)
    specs += _inception_d("Mixed_7a", 768)
    specs += _inception_e("Mixed_7b", 1280)
    specs += _inception_e("Mixed_7c", 2048)
    return specs


def init_inception_params(weights_path: Optional[str] = None) -> Dict:
    """Load folded-BN weights from npz, or a deterministic surrogate init."""
    specs = conv_specs()
    if weights_path and os.path.exists(weights_path):
        params = {}
        with np.load(weights_path) as z:
            for name, cin, cout, (kh, kw), _s, _p in specs:
                w = z[name + ".w"]
                b = z[name + ".b"]
                assert w.shape == (kh, kw, cin, cout), (name, w.shape)
                params[name] = {"w": jnp.asarray(w), "b": jnp.asarray(b)}
        return params
    warnings.warn(
        "InceptionV3 weights file not found — using a DETERMINISTIC SURROGATE "
        "init. FID values are internally consistent but NOT comparable to "
        "published FID numbers. Port real weights with tools/port_inception.py.")
    params = {}
    for name, cin, cout, (kh, kw), _s, _p in specs:
        seed = zlib.crc32(name.encode()) & 0xFFFFFFFF
        rng = np.random.default_rng(seed)
        fan_in = cin * kh * kw
        w = rng.standard_normal((kh, kw, cin, cout)) * np.sqrt(2.0 / fan_in)
        params[name] = {"w": jnp.asarray(w, jnp.float32),
                        "b": jnp.zeros((cout,), jnp.float32)}
    return params


# ------------------------------------------------------------ forward

_SPECS_BY_NAME = {s[0]: s for s in conv_specs()}


def _bconv(params: Dict, name: str, x: jax.Array) -> jax.Array:
    """BasicConv2d with folded BN: conv + bias + relu."""
    _, _cin, _cout, _k, (sh, sw), (ph, pw) = _SPECS_BY_NAME[name]
    p = params[name]
    y = jax.lax.conv_general_dilated(
        x, p["w"].astype(x.dtype), (sh, sw),
        [(ph, ph), (pw, pw)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return jax.nn.relu(y + p["b"].astype(y.dtype))


def _maxpool3_s2(x):
    return jax.lax.reduce_window(x, -jnp.inf, jax.lax.max,
                                 (1, 3, 3, 1), (1, 2, 2, 1), "VALID")


def _maxpool3_s1_p1(x):
    return jax.lax.reduce_window(x, -jnp.inf, jax.lax.max,
                                 (1, 3, 3, 1), (1, 1, 1, 1),
                                 [(0, 0), (1, 1), (1, 1), (0, 0)])


def _avgpool3_s1_p1(x):
    """3x3 stride-1 avg pool, count_include_pad=False (FID variant)."""
    s = jax.lax.reduce_window(x, 0.0, jax.lax.add, (1, 3, 3, 1), (1, 1, 1, 1),
                              [(0, 0), (1, 1), (1, 1), (0, 0)])
    ones = jnp.ones(x.shape[1:3], x.dtype)[None, :, :, None]
    cnt = jax.lax.reduce_window(ones, 0.0, jax.lax.add, (1, 3, 3, 1),
                                (1, 1, 1, 1),
                                [(0, 0), (1, 1), (1, 1), (0, 0)])
    return s / cnt


def _block_a(params, prefix, x):
    b1 = _bconv(params, f"{prefix}.branch1x1", x)
    b5 = _bconv(params, f"{prefix}.branch5x5_2",
                _bconv(params, f"{prefix}.branch5x5_1", x))
    b3 = _bconv(params, f"{prefix}.branch3x3dbl_1", x)
    b3 = _bconv(params, f"{prefix}.branch3x3dbl_2", b3)
    b3 = _bconv(params, f"{prefix}.branch3x3dbl_3", b3)
    bp = _bconv(params, f"{prefix}.branch_pool", _avgpool3_s1_p1(x))
    return jnp.concatenate([b1, b5, b3, bp], axis=-1)


def _block_b(params, prefix, x):
    b3 = _bconv(params, f"{prefix}.branch3x3", x)
    bd = _bconv(params, f"{prefix}.branch3x3dbl_1", x)
    bd = _bconv(params, f"{prefix}.branch3x3dbl_2", bd)
    bd = _bconv(params, f"{prefix}.branch3x3dbl_3", bd)
    return jnp.concatenate([b3, bd, _maxpool3_s2(x)], axis=-1)


def _block_c(params, prefix, x):
    b1 = _bconv(params, f"{prefix}.branch1x1", x)
    b7 = _bconv(params, f"{prefix}.branch7x7_1", x)
    b7 = _bconv(params, f"{prefix}.branch7x7_2", b7)
    b7 = _bconv(params, f"{prefix}.branch7x7_3", b7)
    bd = _bconv(params, f"{prefix}.branch7x7dbl_1", x)
    for i in (2, 3, 4, 5):
        bd = _bconv(params, f"{prefix}.branch7x7dbl_{i}", bd)
    bp = _bconv(params, f"{prefix}.branch_pool", _avgpool3_s1_p1(x))
    return jnp.concatenate([b1, b7, bd, bp], axis=-1)


def _block_d(params, prefix, x):
    b3 = _bconv(params, f"{prefix}.branch3x3_2",
                _bconv(params, f"{prefix}.branch3x3_1", x))
    b7 = _bconv(params, f"{prefix}.branch7x7x3_1", x)
    for i in (2, 3, 4):
        b7 = _bconv(params, f"{prefix}.branch7x7x3_{i}", b7)
    return jnp.concatenate([b3, b7, _maxpool3_s2(x)], axis=-1)


def _block_e(params, prefix, x, *, max_pool_branch: bool):
    b1 = _bconv(params, f"{prefix}.branch1x1", x)
    b3 = _bconv(params, f"{prefix}.branch3x3_1", x)
    b3 = jnp.concatenate([
        _bconv(params, f"{prefix}.branch3x3_2a", b3),
        _bconv(params, f"{prefix}.branch3x3_2b", b3)], axis=-1)
    bd = _bconv(params, f"{prefix}.branch3x3dbl_1", x)
    bd = _bconv(params, f"{prefix}.branch3x3dbl_2", bd)
    bd = jnp.concatenate([
        _bconv(params, f"{prefix}.branch3x3dbl_3a", bd),
        _bconv(params, f"{prefix}.branch3x3dbl_3b", bd)], axis=-1)
    pooled = _maxpool3_s1_p1(x) if max_pool_branch else _avgpool3_s1_p1(x)
    bp = _bconv(params, f"{prefix}.branch_pool", pooled)
    return jnp.concatenate([b1, b3, bd, bp], axis=-1)


def _resize_bilinear_299(x: jax.Array) -> jax.Array:
    """torch F.interpolate(size=299, mode='bilinear', align_corners=False)
    == jax.image.resize 'linear' with antialias=False (half-pixel centers).
    antialias matters: torch does NOT antialias, and jax's default does on
    DOWNSCALE — measured max pixel diff 0.57 on [0,1] inputs for a 512->299
    resize (1.8e-7 without), which would make >299px FID features
    incomparable to pytorch-fid's."""
    b, _, _, c = x.shape
    return jax.image.resize(x, (b, 299, 299, c), method="linear",
                            antialias=False)


def inception_pool3(params: Dict, x: jax.Array, *, resize_input: bool = True,
                    normalize_input: bool = True) -> jax.Array:
    """x: (B, H, W, 3) in [0, 1] -> (B, 2048) pool3 features."""
    if resize_input:
        x = _resize_bilinear_299(x)
    if normalize_input:
        x = 2.0 * x - 1.0
    x = _bconv(params, "Conv2d_1a_3x3", x)
    x = _bconv(params, "Conv2d_2a_3x3", x)
    x = _bconv(params, "Conv2d_2b_3x3", x)
    x = _maxpool3_s2(x)
    x = _bconv(params, "Conv2d_3b_1x1", x)
    x = _bconv(params, "Conv2d_4a_3x3", x)
    x = _maxpool3_s2(x)
    x = _block_a(params, "Mixed_5b", x)
    x = _block_a(params, "Mixed_5c", x)
    x = _block_a(params, "Mixed_5d", x)
    x = _block_b(params, "Mixed_6a", x)
    x = _block_c(params, "Mixed_6b", x)
    x = _block_c(params, "Mixed_6c", x)
    x = _block_c(params, "Mixed_6d", x)
    x = _block_c(params, "Mixed_6e", x)
    x = _block_d(params, "Mixed_7a", x)
    x = _block_e(params, "Mixed_7b", x, max_pool_branch=False)
    x = _block_e(params, "Mixed_7c", x, max_pool_branch=True)
    return jnp.mean(x, axis=(1, 2))  # adaptive avg pool to (1,1) -> 2048
