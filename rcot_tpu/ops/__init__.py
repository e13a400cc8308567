"""Operator tier: pure-jnp reference implementations + fused Pallas TPU kernels.

Every hot op has a jnp twin (ground truth for unit tests) and, where it pays,
a Pallas fast path selected via `rcot_tpu.ops.dispatch`.
"""

from .conv import conv2d, init_conv2d, init_linear, linear
from .layernorm import init_layernorm, layernorm
from .attention import init_mdta, mdta, mdta_attend
from .gdfn import gdfn, init_gdfn
from .resample import (
    downsample, init_downsample, init_upsample, pixel_shuffle, pixel_unshuffle,
    upsample,
)
from .fourier import fourier_residual_penalty, residual_rmse
from .edges import edge_map

__all__ = [
    "edge_map",
    "conv2d", "init_conv2d", "init_linear", "linear",
    "init_layernorm", "layernorm",
    "init_mdta", "mdta", "mdta_attend",
    "gdfn", "init_gdfn",
    "downsample", "init_downsample", "init_upsample",
    "pixel_shuffle", "pixel_unshuffle", "upsample",
    "fourier_residual_penalty", "residual_rmse",
]
