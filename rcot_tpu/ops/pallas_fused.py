"""Fused (1x1 conv -> depthwise 3x3 -> gelu-gate -> 1x1 conv) Pallas kernel.

Why: whole-program ablation on the v5e (perf/probe_r2.jsonl, BENCH.md) shows
the depthwise convolutions cost ~34% of the full minimax iteration — XLA's
TPU lowering wraps each one in "data formatting" copies and materializes the
wide hidden tensors in HBM. This kernel keeps the wide intermediates in VMEM:
for the GDFN that means x (C channels) is read once and the gated output (C)
written once, while the 2*hidden-wide tensors never touch HBM; for the MDTA
qkv path it fuses the 1x1 qkv projection with its depthwise conv.

Design (no manual DMA — grid pipelining only, so no 128-lane DMA alignment
constraints; the round-1 manual-DMA kernel ops/pallas_dwconv.py paid channel
padding copies that ate its wins):
- grid (B, H/TH); the x block is (1, TH, W, C) plus clamped single-row halo
  blocks above/below (backward: two rows) — boundary rows are masked to the
  conv's zero padding.
- inside the kernel: rows @ W_in on the MXU (fp32 accum), column-padded
  9-tap depthwise accumulate on the VPU, exact-erf gelu gate, rows @ W_out.
- backward is its OWN fused kernel (recompute-based: only x and the output
  cotangent are read; h/conv/gate are rebuilt in VMEM) producing dx plus
  dW_in/ddw/dW_out accumulated across grid steps into revisited blocks.

Channel-split exactness for unaligned hidden sizes (parity config 2H=254):
the wrapper pads W_in/dw/W_out with zero channels per gate half, so the
lane-dim split stays at a 128 boundary and the dead channels contribute
exactly zero (gelu(0)*x2*0-row == 0).

Reference behavior being fused: Net_Restormer.py:67-85 (GDFN), :35-38 (qkv
dwconv). Numerics: fp32 matmul accumulation, elementwise in input dtype.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_RSQRT2 = 0.7071067811865476
_RSQRT2PI = 0.3989422804014327


def _erf(x):
    """erf via Abramowitz-Stegun 7.1.26 (|error| < 1.5e-7): Mosaic has no
    erf primitive, and 1.5e-7 is far below the model's fp32/bf16 noise."""
    a1, a2, a3, a4, a5 = (0.254829592, -0.284496736, 1.421413741,
                          -1.453152027, 1.061405429)
    p = 0.3275911
    s = jnp.sign(x)
    ax = jnp.abs(x)
    t = 1.0 / (1.0 + p * ax)
    poly = ((((a5 * t + a4) * t + a3) * t + a2) * t + a1) * t
    return s * (1.0 - poly * jnp.exp(-ax * ax))


def _gelu(x):
    return x * 0.5 * (1.0 + _erf(x * _RSQRT2))


def _gelu_grad(x):
    phi = 0.5 * (1.0 + _erf(x * _RSQRT2))
    return phi + x * _RSQRT2PI * jnp.exp(-0.5 * x * x)


def _colpad(v):
    """Zero-pad the W axis (axis 1) of (rows, W, C) by 1 on each side."""
    z = jnp.zeros((v.shape[0], 1, v.shape[2]), v.dtype)
    return jnp.concatenate([z, v, z], axis=1)


def _dw9(hp, dwk, rows):
    """9-tap depthwise accumulate: hp (rows+2, W+2, C) col/row-padded band,
    dwk (3, 3, C) -> (rows, W, C) fp32."""
    w = hp.shape[1] - 2
    acc = None
    for dy in range(3):
        for dx in range(3):
            tap = hp[dy:dy + rows, dx:dx + w, :].astype(jnp.float32)
            term = tap * dwk[dy, dx, :].astype(jnp.float32)
            acc = term if acc is None else acc + term
    return acc


def _dw9_corr(dcp, dwk, rows):
    """rot180 correlation of the dconv cotangent with dwk — the depthwise
    backward's dh. dcp: (rows+2, W+2, M) col-padded dconv band whose row 0
    is the output row ABOVE the band's first mid row; in band coords
    dh[j] = sum_{dy,dx} dcp[j+2-dy, i+2-dx] * dwk[dy, dx] (tap row range
    max = 2-0+rows = rows+2, exactly the band). Shared by the fused-tier
    and block-tier backward kernels: the dy/dx index algebra is the
    subtlest part of both and must stay identical."""
    w = dcp.shape[1] - 2
    acc = None
    for dy in range(3):
        for dx in range(3):
            tap = dcp[2 - dy:2 - dy + rows, 2 - dx:2 - dx + w, :]
            term = tap * dwk[dy, dx, :].astype(jnp.float32)
            acc = term if acc is None else acc + term
    return acc


def _accum_ddw(ddw_ref, hp, dconv_mid, rows):
    """ddw[dy,dx,c] += sum over the band's mid out-rows of dconv * h taps.
    hp: (rows+4, W+2, M) col-padded h band whose row 0 is abs row rTH-2, so
    mid out row j (abs rTH+j) taps h abs rows rTH+j-1+dy = hp rows j+1+dy.
    Shared by both backward kernels (see _dw9_corr)."""
    w = hp.shape[1] - 2
    for dy in range(3):
        for dx in range(3):
            tap = hp[1 + dy:1 + dy + rows, dx:dx + w, :].astype(jnp.float32)
            ddw_ref[dy, dx, :] += jnp.sum(dconv_mid * tap, axis=(0, 1))


def _matmul(a2d, w, out_dtype):
    return jax.lax.dot_general(
        a2d, w, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).astype(out_dtype)


def _bwd_dot_dtype(tier: str = "fused"):
    """Operand dtype for the backward kernels' matmuls. Default fp32:
    every bf16-operand backward shape compiles STANDALONE
    (perf/bisect_block.jsonl 00:0x bwd_bf16 sweep, 34/34 ok) but the whole
    iteration with bf16 backwards crashes the sandbox's remote compile
    helper (probe_r2 00:15 — helper resource exhaustion on program
    composition, same failure class as the gram+tail co-compile).
    RCOT_BWD_BF16 value: 1/all = every tier | a comma list of tiers
    ("fused", "block", "gram") = only those tiers' backward kernels use
    bf16 operands (2x MXU rate); fp32 accumulation either way. Resolved
    through dispatch.resolved_env so the trainer's auto-composition channel
    (user env wins) reaches the kernels without os.environ mutation."""
    from . import dispatch
    env = dispatch.resolved_env("RCOT_BWD_BF16", "0")
    if env in ("", "0"):
        return jnp.float32
    if env in ("1", "all") or tier in env.split(","):
        return jnp.bfloat16
    return jnp.float32


def _bwd_dot(a2d, b2d, contract, tier: str = "fused"):
    dt = _bwd_dot_dtype(tier)
    return jax.lax.dot_general(
        a2d.astype(dt), b2d.astype(dt), (contract, ((), ())),
        preferred_element_type=jnp.float32)


# ------------------------------------------------------------------ forward

def _fwd_kernel(x_up, x_mid, x_dn, w_in, dwk, w_out, out_ref,
                *, gate: bool, th: int):
    r = pl.program_id(1)
    nr = pl.num_programs(1)
    w_dim = x_mid.shape[2]
    cin = x_mid.shape[3]

    up = jnp.where(r > 0, x_up[0, 0], jnp.zeros_like(x_up[0, 0]))
    dn = jnp.where(r < nr - 1, x_dn[0, 0], jnp.zeros_like(x_dn[0, 0]))
    xb = jnp.concatenate([up[None], x_mid[0], dn[None]], axis=0)  # (TH+2,W,C)

    if w_in is not None:
        h2 = _matmul(xb.reshape((th + 2) * w_dim, cin), w_in[:], xb.dtype)
        h = h2.reshape(th + 2, w_dim, w_in.shape[1])
    else:
        h = xb
    conv = _dw9(_colpad(h), dwk[:], th)  # (TH, W, 2H) fp32

    if gate:
        half = conv.shape[-1] // 2
        g = _gelu(conv[..., :half]) * conv[..., half:]
    else:
        g = conv
    g = g.astype(out_ref.dtype)

    if w_out is not None:
        o = _matmul(g.reshape(th * w_dim, g.shape[-1]), w_out[:],
                    out_ref.dtype)
        out_ref[0] = o.reshape(th, w_dim, w_out.shape[1])
    else:
        out_ref[0] = g


def _pick_th(h: int, w: int, wide: int, itemsize: int,
             budget: int = 6 * 1024 * 1024, *, scale: float = 1.0,
             env_override: bool = True) -> int:
    """Largest row tile dividing h whose band intermediates fit the budget
    (wide = the fattest channel count alive in the kernel, fp32 conv band
    dominates). RCOT_FUSED_VMEM_MB overrides the BASE budget (perf tuning);
    `scale` applies after the override so dtype-aware caller corrections
    (fused_dwconv_bwd's fp32 shrink) hold even when the knob is set.
    Callers with their own knob/per-shape budgets (pallas_block backwards,
    whose larger tail bands CRASH the remote compiler) pass
    env_override=False so the fused-tier knob cannot clobber them."""
    import os
    env = os.environ.get("RCOT_FUSED_VMEM_MB") if env_override else None
    if env:
        budget = int(float(env) * 1024 * 1024)
    budget = int(budget * scale)
    for th in (64, 32, 16, 8, 4, 2, 1):
        if h % th:
            continue
        band = (th + 4) * (w + 2) * wide * (4 + itemsize)
        if band <= budget:
            return th
    return 1


def _row_specs(th: int, w: int, c: int, h_rows: int, *, halo: int):
    """BlockSpecs for x: halo single-row blocks above/below + the mid block.

    Returns list of (block_shape, index_map) covering rows
    [r*TH - halo, r*TH + TH + halo) as `2*halo + 1` inputs.
    """
    specs = []
    for k in range(halo, 0, -1):
        specs.append(pl.BlockSpec(
            (1, 1, w, c),
            lambda b, r, k=k: (b, jnp.maximum(r * th - k, 0), 0, 0),
            memory_space=pltpu.VMEM))
    specs.append(pl.BlockSpec(
        (1, th, w, c), lambda b, r: (b, r, 0, 0), memory_space=pltpu.VMEM))
    for k in range(1, halo + 1):
        specs.append(pl.BlockSpec(
            (1, 1, w, c),
            lambda b, r, k=k: (b, jnp.minimum(r * th + th + k - 1,
                                              h_rows - 1), 0, 0),
            memory_space=pltpu.VMEM))
    return specs


def _full_spec():
    return pl.BlockSpec(memory_space=pltpu.VMEM)


def fused_dwconv_fwd(x: jax.Array, w_in: Optional[jax.Array],
                     dwk: jax.Array, w_out: Optional[jax.Array],
                     *, gate: bool, interpret: bool = False) -> jax.Array:
    """x (B,H,W,C); w_in (C,M) or None; dwk (3,3,M); w_out (Mg,Co) or None.
    M = dwk channels; Mg = M//2 if gate else M. Returns (B,H,W,Co or Mg)."""
    b, h, w_dim, c = x.shape
    m = dwk.shape[2]
    mg = m // 2 if gate else m
    cout = w_out.shape[1] if w_out is not None else mg
    th = _pick_th(h, w_dim, m, x.dtype.itemsize)

    in_specs = _row_specs(th, w_dim, c, h, halo=1)
    operands = [x, x, x]
    if w_in is not None:
        in_specs.append(_full_spec())
        operands.append(w_in)
    in_specs.append(_full_spec())
    operands.append(dwk)
    if w_out is not None:
        in_specs.append(_full_spec())
        operands.append(w_out)

    def kernel(*refs):
        i = 0
        x_up, x_mid, x_dn = refs[0], refs[1], refs[2]
        i = 3
        w_in_ref = None
        if w_in is not None:
            w_in_ref = refs[i]
            i += 1
        dwk_ref = refs[i]
        i += 1
        w_out_ref = refs[i] if w_out is not None else None
        _fwd_kernel(x_up, x_mid, x_dn, w_in_ref, dwk_ref, w_out_ref,
                    refs[-1], gate=gate, th=th)

    return pl.pallas_call(
        kernel,
        grid=(b, h // th),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, th, w_dim, cout), lambda bb, r: (bb, r, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, h, w_dim, cout), x.dtype),
        interpret=interpret,
    )(*operands)


# ----------------------------------------------------------------- backward

_BWD_BUDGET = 4 * 1024 * 1024


def _bwd_th(h: int, w: int, m: int, itemsize: int) -> int:
    """Row tile for the fused backward: the 4 MB model-estimate budget,
    scaled to 5/8 for fp32 activations (see fused_dwconv_bwd). The single
    production path for backward tile selection — tested directly."""
    return _pick_th(h, w, m, itemsize, budget=_BWD_BUDGET,
                    scale=1.0 if itemsize <= 2 else 0.625)

def _bwd_kernel(refs, *, gate: bool, th: int, has_in: bool, has_out: bool):
    i = 0
    x_rows = refs[i:i + 5]  # up2, up1, mid, dn1, dn2
    i += 5
    g_rows = refs[i:i + 3]  # gup, gmid, gdn
    i += 3
    w_in = refs[i] if has_in else None
    i += 1 if has_in else 0
    dwk = refs[i]
    i += 1
    w_out = refs[i] if has_out else None
    i += 1 if has_out else 0
    dx_ref, dwin_ref, ddw_ref, dwout_ref = refs[i:i + 4]

    r = pl.program_id(1)
    nr = pl.num_programs(1)
    first = jnp.logical_and(pl.program_id(0) == 0, r == 0)
    w_dim = x_rows[2].shape[2]
    cin = x_rows[2].shape[3]
    m = dwk.shape[2]
    mh = m // 2 if gate else m

    # x band rows [rTH-2, rTH+TH+2): mask out-of-image rows to zero
    up2 = jnp.where(r * th - 2 >= 0, x_rows[0][0, 0],
                    jnp.zeros_like(x_rows[0][0, 0]))
    up1 = jnp.where(r * th - 1 >= 0, x_rows[1][0, 0],
                    jnp.zeros_like(x_rows[1][0, 0]))
    dn1 = jnp.where(r < nr - 1, x_rows[3][0, 0],
                    jnp.zeros_like(x_rows[3][0, 0]))
    dn2 = jnp.where(r * th + th + 1 <= nr * th - 1, x_rows[4][0, 0],
                    jnp.zeros_like(x_rows[4][0, 0]))
    xb = jnp.concatenate([up2[None], up1[None], x_rows[2][0],
                          dn1[None], dn2[None]], axis=0)  # (TH+4, W, C)

    # cotangent band rows [rTH-1, rTH+TH+1): zero outside the image
    gup = jnp.where(r > 0, g_rows[0][0, 0], jnp.zeros_like(g_rows[0][0, 0]))
    gdn = jnp.where(r < nr - 1, g_rows[2][0, 0],
                    jnp.zeros_like(g_rows[2][0, 0]))
    gb = jnp.concatenate([gup[None], g_rows[1][0], gdn[None]], axis=0)

    # recompute h for rows [rTH-2, rTH+TH+2)
    if has_in:
        h2 = _matmul(xb.reshape((th + 4) * w_dim, cin), w_in[:], xb.dtype)
        h = h2.reshape(th + 4, w_dim, m)
    else:
        h = xb
    hp = _colpad(h)

    # conv for band rows [rTH-1, rTH+TH+1) (TH+2 rows): band row j uses
    # h rows [j, j+3) of hp's row axis offset by 0 (hp row 0 = rTH-2 ...
    # conv band row 0 = abs row rTH-1 taps h abs rows rTH-2..rTH -> hp rows
    # 0..2) — exactly _dw9 over TH+2 rows.
    conv = _dw9(hp, dwk[:], th + 2)  # (TH+2, W, M) fp32

    # dgate for band rows: g @ W_out^T (or g itself).
    # NOTE on dtypes: bf16-operand variants of these backward matmuls CRASH
    # the TPU compile helper (opaque HTTP 500, reproduced on the full
    # iteration 2026-08-16); fp32 operands compile and run. Revisit when the
    # toolchain moves.
    if has_out:
        co = w_out.shape[1]
        dg2 = _bwd_dot(gb.reshape((th + 2) * w_dim, co), w_out[:],
                       ((1,), (1,)))
        dgate = dg2.reshape(th + 2, w_dim, mh)
    else:
        dgate = gb.astype(jnp.float32)

    # dconv band (TH+2 rows, M channels)
    if gate:
        x1 = conv[..., :mh]
        x2 = conv[..., mh:]
        dconv = jnp.concatenate(
            [dgate * x2 * _gelu_grad(x1), dgate * _gelu(x1)], axis=-1)
    else:
        dconv = dgate

    # dh for mid rows [rTH, rTH+TH): correlation of dconv with rot180(dwk).
    # dh[abs row m][i] = sum_{dy,dx} dconv[m+1-dy, i+1-dx] * dwk[dy,dx]
    # in band coords (dconv band row 0 = abs rTH-1): m+1-dy - (rTH-1)
    # = (m-rTH) + 2-dy. With dcp = pad(dconv): rows shift by 0, cols by 1.
    dh = _dw9_corr(_colpad(dconv), dwk, th)

    # dx = dh @ W_in^T (mid rows)
    if has_in:
        dx2 = _bwd_dot(dh.reshape(th * w_dim, m), w_in[:], ((1,), (1,)))
        dx_ref[0] = dx2.reshape(th, w_dim, cin).astype(dx_ref.dtype)
    else:
        dx_ref[0] = dh.astype(dx_ref.dtype)

    # ---- accumulated weight grads (blocks revisited every grid step) ----
    @pl.when(first)
    def _():
        dwin_ref[...] = jnp.zeros_like(dwin_ref)
        ddw_ref[...] = jnp.zeros_like(ddw_ref)
        dwout_ref[...] = jnp.zeros_like(dwout_ref)

    if has_in:
        # dW_in += x_mid^T @ dh  (mid rows only: each row counted once)
        xm = xb[2:2 + th].reshape(th * w_dim, cin)
        dwin_ref[...] += _bwd_dot(xm, dh.reshape(th * w_dim, m),
                                  ((0,), (0,)))

    # ddwk[dy,dx,c] += sum over mid out rows of dconv_mid * h taps
    dconv_mid = dconv[1:1 + th]  # band row 1 = abs row rTH
    _accum_ddw(ddw_ref, hp, dconv_mid, th)

    if has_out:
        # dW_out += gate_mid^T @ g_mid
        conv_mid = conv[1:1 + th]
        if gate:
            gate_mid = _gelu(conv_mid[..., :mh]) * conv_mid[..., mh:]
        else:
            gate_mid = conv_mid
        gm = gate_mid.reshape(th * w_dim, mh)
        g2 = g_rows[1][0].reshape(th * w_dim, w_out.shape[1])
        dwout_ref[...] += _bwd_dot(gm, g2, ((0,), (0,)))


def fused_dwconv_bwd(x: jax.Array, w_in: Optional[jax.Array],
                     dwk: jax.Array, w_out: Optional[jax.Array],
                     g: jax.Array, *, gate: bool, interpret: bool = False):
    b, h, w_dim, c = x.shape
    m = dwk.shape[2]
    has_in = w_in is not None
    has_out = w_out is not None
    mh = m // 2 if gate else m
    co = w_out.shape[1] if has_out else mh
    # fp32 activations need a smaller band: at the 4 MB model-estimate budget
    # the real scoped-VMEM stack lands just over the 16 MB hardware limit
    # (observed: 16.72M on the [3,128,128,48]->192 qkv bwd, estimate 3.99M;
    # the bf16 twin of the same band fits). Scaling the budget to 5/8 admits
    # the next tile rung down (th=8 there, est 2.40M -> ~10M projected real
    # at the observed 4.2x real/estimate ratio; on-chip check:
    # tools/probe_fp32_band.py) instead of over-shrinking to th=4 and
    # doubling grid steps.
    th = _bwd_th(h, w_dim, m, x.dtype.itemsize)

    in_specs = _row_specs(th, w_dim, c, h, halo=2)
    operands = [x] * 5
    in_specs += _row_specs(th, w_dim, co, h, halo=1)
    operands += [g] * 3
    if has_in:
        in_specs.append(_full_spec())
        operands.append(w_in)
    in_specs.append(_full_spec())
    operands.append(dwk)
    if has_out:
        in_specs.append(_full_spec())
        operands.append(w_out)

    # dummy 1-sized grads for absent weights keep the out structure static
    win_shape = (c, m) if has_in else (1, 1)
    wout_shape = (mh, co) if has_out else (1, 1)

    def kernel(*refs):
        _bwd_kernel(refs, gate=gate, th=th, has_in=has_in, has_out=has_out)

    const = lambda bb, r: (0, 0)  # noqa: E731
    const3 = lambda bb, r: (0, 0, 0)  # noqa: E731
    dx, dwin, ddw, dwout = pl.pallas_call(
        kernel,
        grid=(b, h // th),
        in_specs=in_specs,
        out_specs=(
            pl.BlockSpec((1, th, w_dim, c), lambda bb, r: (bb, r, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(win_shape, const, memory_space=pltpu.VMEM),
            pl.BlockSpec((3, 3, m), const3, memory_space=pltpu.VMEM),
            pl.BlockSpec(wout_shape, const, memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((b, h, w_dim, c), x.dtype),
            jax.ShapeDtypeStruct(win_shape, jnp.float32),
            jax.ShapeDtypeStruct((3, 3, m), jnp.float32),
            jax.ShapeDtypeStruct(wout_shape, jnp.float32),
        ),
        interpret=interpret,
    )(*operands)
    return dx, dwin, ddw, dwout


# -------------------------------------------------------------- custom vjp

@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def fused_dwconv(x, w_in, dwk, w_out, gate=False, interpret=False):
    """Differentiable fused [1x1 ->] dw3x3 [-> gelu-gate] [-> 1x1].

    w_in/w_out may be None (skipped stages). Gradients flow to x and all
    present weights; fwd saves ONLY (x, weights) — intermediates are
    recomputed in VMEM by the backward kernel.
    """
    return fused_dwconv_fwd(x, w_in, dwk, w_out, gate=gate,
                            interpret=interpret)


def _vjp_fwd(x, w_in, dwk, w_out, gate, interpret):
    out = fused_dwconv_fwd(x, w_in, dwk, w_out, gate=gate, interpret=interpret)
    return out, (x, w_in, dwk, w_out)


def _vjp_bwd(gate, interpret, res, g):
    x, w_in, dwk, w_out = res
    dx, dwin, ddw, dwout = fused_dwconv_bwd(
        x, w_in, dwk, w_out, g, gate=gate, interpret=interpret)
    return (dx,
            dwin.astype(w_in.dtype) if w_in is not None else None,
            ddw.astype(dwk.dtype),
            dwout.astype(w_out.dtype) if w_out is not None else None)


fused_dwconv.defvjp(_vjp_fwd, _vjp_bwd)


# ------------------------------------------------------------ module-level

def pad_gate_halves(w_in, dwk, w_out):
    """Zero-pad each gate half of (w_in, dwk) and the rows of w_out so the
    gate split lands on a 128-lane boundary. Exact: the dead channels carry
    zero weights and gelu(0) * x2 * 0-row contributes exactly zero (module
    docstring). The ONE copy of this logic — the fused tier (gdfn_fused)
    and the block tier (pallas_block.block_tail) must stay numerically
    identical, so both call here."""
    m = dwk.shape[2]
    half = m // 2
    pad_half = (-half) % 128
    if not pad_half:
        return w_in, dwk, w_out
    z_in = jnp.zeros((w_in.shape[0], pad_half), w_in.dtype)
    w_in = jnp.concatenate(
        [w_in[:, :half], z_in, w_in[:, half:], z_in], axis=1)
    z_dw = jnp.zeros((3, 3, pad_half), dwk.dtype)
    dwk = jnp.concatenate(
        [dwk[..., :half], z_dw, dwk[..., half:], z_dw], axis=-1)
    z_out = jnp.zeros((pad_half, w_out.shape[1]), w_out.dtype)
    w_out = jnp.concatenate([w_out, z_out], axis=0)
    return w_in, dwk, w_out


def pad_crashing_m(w_in, dwk):
    """Zero-pad the dw channel count past a compile-crashing lane count
    (_M_PAD). Returns (w_in, dwk, m) with m the ORIGINAL count — callers
    slice the kernel output back to [..., :m]. Shared by the fused-tier
    qkv path and pallas_block.block_head (padded lanes carry zero weights
    and receive zero cotangents, so results are exact)."""
    m = dwk.shape[2]
    m_pad = _M_PAD.get(m, m)
    if m_pad == m:
        return w_in, dwk, m
    return (jnp.pad(w_in, ((0, 0), (0, m_pad - m))),
            jnp.pad(dwk, ((0, 0), (0, 0), (0, m_pad - m))), m)


def gdfn_fused(x: jax.Array, w_in: jax.Array, dwk: jax.Array,
               w_out: jax.Array, *, interpret: bool = False) -> jax.Array:
    """Whole GDFN (reference Net_Restormer.py:67-85) in one kernel.

    w_in (C, 2H) [1x1 proj_in], dwk (3,3,2H), w_out (H, C) [1x1 proj_out].
    For unaligned H (parity 127/255/...), channels are padded per gate half
    to the next multiple of 128 with zeros — exact (see module docstring).
    """
    w_in, dwk, w_out = pad_gate_halves(w_in, dwk, w_out)
    return fused_dwconv(x, w_in, dwk, w_out, True, interpret)


# Channel counts whose BACKWARD kernel crashes the TPU compile helper
# (empirically: m=144 fails at every W probed while 152/160/192/256/288/510/
# 576/1020/1152/2042 all compile — perf/probe_r2 bwd shape sweep). Padded
# lanes carry zero weights and receive zero cotangents, so results are exact.
_M_PAD = {144: 192}


def conv1x1_dw_fused(x: jax.Array, w_in: jax.Array, dwk: jax.Array,
                     *, interpret: bool = False) -> jax.Array:
    """1x1 conv + depthwise 3x3 in one kernel (the MDTA qkv path,
    reference Net_Restormer.py:35-38)."""
    w_in, dwk, m = pad_crashing_m(w_in, dwk)
    out = fused_dwconv(x, w_in, dwk, None, False, interpret)
    return out[..., :m] if out.shape[-1] != m else out
