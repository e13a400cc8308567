"""LPIPS perceptual distance (AlexNet variant) in JAX (NHWC).

The reference lists lpips in its environment (env.yml:40) and imports it
(utils.py:13) but the actual calls are commented out (evaluate.py:78,95-96) —
it is the last reference-named metric. This is a faithful re-implementation
of the lpips package's 'alex' scorer (Zhang et al., CVPR 2018):

  1. scale inputs from [0,1] to [-1,1], then normalize with the package's
     shift/scale constants;
  2. AlexNet-features forward, tapping the five ReLU outputs;
  3. per-layer: channel-unit-normalize both feature maps, squared diff,
     a learned non-negative 1x1 linear head, spatial mean;
  4. sum over layers.

Weights load from an npz ported offline (tools/port_lpips.py documents the
mapping); without a weights file a deterministic surrogate init is used —
scores are then only meaningful relative to other surrogate scores (ordering,
not absolute parity), exactly like the FID surrogate (metrics/inception.py).
The torch-twin test (tests/test_lpips.py) pins the JAX forward against an
independent PyTorch implementation on shared weights.
"""

from __future__ import annotations

import functools
import os
import warnings
import zlib
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

# lpips package scaling layer constants (ScalingLayer in lpips/lpips.py)
_SHIFT = np.array([-0.030, -0.088, -0.188], np.float32)
_SCALE = np.array([0.458, 0.448, 0.450], np.float32)

# AlexNet feature convs: (name, cin, cout, kernel, stride, pad)
ALEX_SPECS = [
    ("conv1", 3, 64, 11, 4, 2),
    ("conv2", 64, 192, 5, 1, 2),
    ("conv3", 192, 384, 3, 1, 1),
    ("conv4", 384, 256, 3, 1, 1),
    ("conv5", 256, 256, 3, 1, 1),
]
# channels of the five tapped ReLU outputs (linear head widths)
LIN_CHANNELS = [64, 192, 384, 256, 256]


def init_lpips_params(weights_path: Optional[str] = None) -> Dict:
    """Load ported weights (npz: conv*.w/b HWIO, lin*.w (C,)) or surrogate."""
    if weights_path and os.path.exists(weights_path):
        params: Dict = {}
        with np.load(weights_path) as z:
            for name, cin, cout, k, _s, _p in ALEX_SPECS:
                w = z[name + ".w"]
                assert w.shape == (k, k, cin, cout), (name, w.shape)
                params[name] = {"w": jnp.asarray(w),
                                "b": jnp.asarray(z[name + ".b"])}
            for i, c in enumerate(LIN_CHANNELS):
                w = z[f"lin{i}.w"]
                assert w.shape == (c,), (i, w.shape)
                params[f"lin{i}"] = jnp.asarray(w)
        return params
    warnings.warn(
        "LPIPS weights file not found — using a DETERMINISTIC SURROGATE "
        "init. Scores are only comparable to other surrogate scores.")
    params = {}
    for name, cin, cout, k, _s, _p in ALEX_SPECS:
        rng = np.random.default_rng(zlib.crc32(name.encode()) & 0xFFFFFFFF)
        fan_in = cin * k * k
        params[name] = {
            "w": jnp.asarray(rng.standard_normal((k, k, cin, cout))
                             * np.sqrt(2.0 / fan_in), jnp.float32),
            "b": jnp.zeros((cout,), jnp.float32)}
    for i, c in enumerate(LIN_CHANNELS):
        rng = np.random.default_rng(zlib.crc32(f"lin{i}".encode()) & 0xFFFFFFFF)
        params[f"lin{i}"] = jnp.asarray(rng.uniform(0.0, 1.0, (c,)), jnp.float32)
    return params


def _alex_features(params: Dict, x: jax.Array) -> list:
    """x: (B,H,W,3) already scaled/normalized -> 5 tapped ReLU outputs."""
    feats = []
    for i, (name, _cin, _cout, _k, s, p) in enumerate(ALEX_SPECS):
        w = params[name]["w"].astype(x.dtype)
        x = jax.lax.conv_general_dilated(
            x, w, (s, s), [(p, p), (p, p)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        x = jax.nn.relu(x + params[name]["b"].astype(x.dtype))
        feats.append(x)
        if i < 2:  # maxpool after relu1 and relu2 (torchvision AlexNet)
            x = jax.lax.reduce_window(x, -jnp.inf, jax.lax.max,
                                      (1, 3, 3, 1), (1, 2, 2, 1), "VALID")
    return feats


def _unit_normalize(f: jax.Array, eps: float = 1e-10) -> jax.Array:
    """lpips normalize_tensor: unit L2 over the channel axis."""
    norm = jnp.sqrt(jnp.sum(jnp.square(f), axis=-1, keepdims=True))
    return f / (norm + eps)


def lpips(params: Dict, x: jax.Array, y: jax.Array) -> jax.Array:
    """x, y: (B, H, W, 3) in [0, 1] -> (B,) LPIPS distances."""
    def prep(v):
        v = 2.0 * v - 1.0
        return (v - _SHIFT) / _SCALE

    fx = _alex_features(params, prep(x))
    fy = _alex_features(params, prep(y))
    total = 0.0
    for i, (a, b) in enumerate(zip(fx, fy)):
        d = jnp.square(_unit_normalize(a) - _unit_normalize(b))
        w = params[f"lin{i}"].astype(d.dtype)  # non-negative 1x1 head
        total = total + jnp.mean(jnp.sum(d * w, axis=-1), axis=(1, 2))
    return total


@functools.lru_cache(maxsize=4)
def _cached_lpips_fn(weights: Optional[str]):
    """One (params, jitted fn) per weights path: a fresh closure per call
    would recompile the AlexNet forward (and re-read the npz) every pair."""
    params = init_lpips_params(weights)
    return jax.jit(lambda a, b: lpips(params, a, b))


def lpips_pair(x: np.ndarray, y: np.ndarray,
               weights: Optional[str] = None) -> float:
    """Convenience: single image pair (H,W,3) in [0,1] -> float."""
    fn = _cached_lpips_fn(weights)
    return float(fn(jnp.asarray(x)[None], jnp.asarray(y)[None])[0])
