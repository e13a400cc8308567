"""Total-variation-style edge map.

Behavioral spec (reference: util/image_utils.py:14-45 `EdgeComputation`):
the absolute difference between each pair of horizontal neighbors is added
to BOTH pixels of the pair (likewise vertically), the result is summed over
channels and divided by 3 (a hard-coded RGB assumption, kept as a quirk),
then divided by 4 (the four scatter contributions). Unused by the reference
main path; provided for API completeness.

NHWC-native and jit-traceable: the neighbor scatters are expressed as pads
(no in-place indexed adds), so XLA fuses the whole map into one elementwise
program.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def edge_map(x: jax.Array) -> jax.Array:
    """x: (..., H, W, C) float. Returns (..., H, W, 1).

    Matches the reference's `EdgeComputation(test=True)` math on NCHW
    tensors, transposed to channel-last (and its test=False single-image
    branch, which computes the same values on CHW input).
    """
    dx = jnp.abs(x[..., :, 1:, :] - x[..., :, :-1, :])  # (..., H, W-1, C)
    dy = jnp.abs(x[..., 1:, :, :] - x[..., :-1, :, :])  # (..., H-1, W, C)
    w_axis, h_axis = x.ndim - 2, x.ndim - 3
    zeros = [(0, 0)] * x.ndim

    def pad(d, axis, before):
        cfg = list(zeros)
        cfg[axis] = (1, 0) if before else (0, 1)
        return jnp.pad(d, cfg)

    y = (pad(dx, w_axis, True) + pad(dx, w_axis, False)
         + pad(dy, h_axis, True) + pad(dy, h_axis, False))
    # Reference divides the channel sum by a literal 3 regardless of C.
    return jnp.sum(y, axis=-1, keepdims=True) / 3.0 / 4.0
