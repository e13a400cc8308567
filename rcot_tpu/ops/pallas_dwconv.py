"""Depthwise 3x3 SAME convolution as a Pallas TPU kernel (NHWC).

Motivation (BENCH.md): XLA's conv lowering wraps every depthwise conv in
"data formatting" copies that profile as the largest non-compute cost of the
training iteration, worst at the non-128-lane-aligned GDFN hiddens. This
kernel computes the dwconv directly on NHWC VMEM tiles: the channel axis
stays on lanes untouched, rows stream through VMEM with a 2-row halo via
manual DMA, and the 3x3 taps are 9 shifted multiply-adds on registers.

Layout: x (B, H, W, C) padded by 1 on H and W by the wrapper (one cheap pad);
weights (3, 3, C). Grid (B, H/tile_h); each step DMAs a (tile_h+2, W+2, C)
row band from HBM and writes a (tile_h, W, C) output block.

Backward: dx is the same kernel with the weights rotated 180 degrees; dw is
a 9-tap shifted reduction done in jnp (it contracts to (3,3,C) — tiny).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(x_hbm, w_ref, out_ref, scratch, sem):
    # x_hbm: (B, H+2, W_pad, C) in ANY/HBM with W_pad % 8 == 0 (left pad 1,
    # right zeros); out block: (1, TH, W, C). Mosaic requires 8-aligned
    # second-minor slices, so column shifts are cyclic rolls (the wrap lands
    # in the zero pad region) and only the final aligned [0:W) slice is taken.
    b = pl.program_id(0)
    r = pl.program_id(1)
    th = out_ref.shape[1]
    w_dim = out_ref.shape[2]

    copy = pltpu.make_async_copy(
        x_hbm.at[b, pl.ds(r * th, th + 2)], scratch, sem)
    copy.start()
    copy.wait()

    w_pad = scratch.shape[1]
    acc = None
    for dy in range(3):
        band = scratch[dy:dy + th]  # leading dim is untiled: any slice ok
        for dx in range(3):
            # want tap[j] = band[j+dx]; roll only takes non-negative shifts,
            # so roll by (w_pad - dx) — the wrapped columns land past W and
            # are discarded by the final [:w_dim] slice.
            tap = band if dx == 0 else pltpu.roll(band, w_pad - dx, 1)
            term = tap.astype(jnp.float32) * w_ref[dy, dx, :].astype(jnp.float32)
            acc = term if acc is None else acc + term
    out_ref[0] = acc[:, :w_dim, :].astype(out_ref.dtype)


def _pick_tile_h(h: int, w: int, c: int, itemsize: int,
                 budget: int = 3 * 1024 * 1024) -> int:
    # budget is deliberately conservative: Mosaic double-buffers the output
    # block and adds scoped-stack slack on top of our scratch (16MB VMEM).
    """Largest row tile dividing h whose halo band fits the VMEM budget."""
    w_pad = ((w + 2 + 7) // 8) * 8
    for th in (64, 32, 16, 8, 4, 2, 1):
        if h % th:
            continue
        band = (th + 2) * w_pad * c * itemsize
        out = th * w * c * itemsize
        if band + out <= budget:
            return th
    return 0


def dwconv3x3_fwd(x: jax.Array, w: jax.Array, *, interpret: bool = False):
    """x: (B, H, W, C) with W % 8 == 0; w: (3, 3, C) -> same shape, SAME pad."""
    b, h, w_dim, c = x.shape
    # Mosaic's sliced-DMA path needs the lane dim in 128 multiples; pad
    # channels (and slice the output back). This costs a real copy each way —
    # see BENCH.md for the measured verdict.
    c_pad = ((c + 127) // 128) * 128
    th = _pick_tile_h(h, w_dim, c_pad, x.dtype.itemsize)
    if th == 0 or w_dim % 8:
        raise ValueError(f"unsupported dwconv shape {x.shape}")
    w_pad = ((w_dim + 2 + 7) // 8) * 8  # 8-aligned second-minor for DMA
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, w_pad - w_dim - 1), (0, c_pad - c)))
    wp = jnp.pad(w, ((0, 0), (0, 0), (0, c_pad - c)))

    out = pl.pallas_call(
        _kernel,
        grid=(b, h // th),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pltpu.VMEM),  # full (3,3,C) weights
        ],
        out_specs=pl.BlockSpec((1, th, w_dim, c_pad), lambda i, r: (i, r, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, h, w_dim, c_pad), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((th + 2, w_pad, c_pad), x.dtype),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(xp, wp)
    return out[..., :c] if c_pad != c else out


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def dwconv3x3_pallas(x, w, interpret=False):
    """Differentiable fused depthwise 3x3 (weights (3,3,C), no bias)."""
    return dwconv3x3_fwd(x, w, interpret=interpret)


def _fwd(x, w, interpret):
    return dwconv3x3_fwd(x, w, interpret=interpret), (x, w)


def _bwd(interpret, res, g):
    x, w = res
    # dx: correlate g with the 180-degree-rotated taps (same kernel)
    w_rot = w[::-1, ::-1, :]
    dx = dwconv3x3_fwd(g, w_rot, interpret=interpret)
    # dw[dy,dx,c] = sum_{b,y,x} g[b,y,x,c] * xpad[b,y+dy,x+dx,c]
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    h, w_dim = x.shape[1], x.shape[2]
    gf = g.astype(jnp.float32)
    taps = []
    for dy in range(3):
        row = []
        for dxi in range(3):
            tap = jax.lax.slice(
                xp, (0, dy, dxi, 0),
                (xp.shape[0], dy + h, dxi + w_dim, xp.shape[3])).astype(jnp.float32)
            row.append(jnp.sum(gf * tap, axis=(0, 1, 2)))
        taps.append(jnp.stack(row))
    dw = jnp.stack(taps).astype(w.dtype)
    return dx.astype(x.dtype), dw


dwconv3x3_pallas.defvjp(_fwd, _bwd)
