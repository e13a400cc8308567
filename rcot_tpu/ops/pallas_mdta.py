"""Fused MDTA transposed-attention Pallas TPU kernel.

Computes, per (batch, head): L2-normalize q and k along the spatial axis,
attn = softmax((q_hat @ k_hat^T) * temperature) over channels, out = attn @ v
(reference math: Net_Restormer.py:39-45) — in ONE kernel, so q/k/v are each
read from HBM exactly once and out written once. The unfused jnp version
materializes normalized q/k and the (c, c) attention through HBM between XLA
fusions; this kernel keeps everything in VMEM.

Key identity exploited: normalize-then-matmul == matmul-then-rescale:
    q_hat @ k_hat^T = (q @ k^T)_ij / (max(|q_i|, eps) * max(|k_j|, eps))
so the kernel streams N in chunks, accumulating G = q @ k^T, sum(q^2), and
sum(k^2) (phase 0), then computes the softmax'd attention once and streams v
to emit out = attn @ v (phase 1). Grid = (B*heads, 2 phases, N/chunk);
scratch accumulators persist across the sequential TPU grid.

Shapes: q, k, v: (BH, c, N) with c a multiple of 8 (c in {24,48,96} for the
RCOT config) and N % chunk == 0 (mod-8 images give N % 64 == 0; the wrapper
picks the largest chunk in {2048,1024,512,256,128,64} dividing N, else falls
back to the jnp path). Gradient support: custom_vjp whose backward
differentiates the pure-jnp reference (recompute).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .attention import mdta_attend as _mdta_attend_jnp

_L2_EPS = 1e-12
# Mosaic requires the trailing block dim to be a multiple of 128 (or the full
# array dim) — no 64-sized partial chunks.
_CHUNKS = (2048, 1024, 512, 256, 128)


def _kernel(temp_ref, q_ref, k_ref, v_ref, out_ref,
            g_acc, sq_acc, sk_acc, p_mat):
    bh = pl.program_id(0)
    phase = pl.program_id(1)
    nc = pl.program_id(2)
    temp = temp_ref[bh]

    @pl.when(jnp.logical_and(phase == 0, nc == 0))
    def _init():
        g_acc[:] = jnp.zeros_like(g_acc)
        sq_acc[:] = jnp.zeros_like(sq_acc)
        sk_acc[:] = jnp.zeros_like(sk_acc)

    @pl.when(phase == 0)
    def _accumulate():
        q = q_ref[0].astype(jnp.float32)
        k = k_ref[0].astype(jnp.float32)
        g_acc[:] += jax.lax.dot_general(
            q, k, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        sq_acc[:] += jnp.sum(jnp.square(q), axis=1, keepdims=True)
        sk_acc[:] += jnp.sum(jnp.square(k), axis=1, keepdims=True)

    @pl.when(jnp.logical_and(phase == 1, nc == 0))
    def _softmax():
        qn = jnp.maximum(jnp.sqrt(sq_acc[:]), _L2_EPS)        # (c, 1)
        kn = jnp.maximum(jnp.sqrt(sk_acc[:]), _L2_EPS)        # (c, 1)
        logits = g_acc[:] / (qn * kn.T) * temp
        p_mat[:] = jax.nn.softmax(logits, axis=-1)

    @pl.when(phase == 1)
    def _emit():
        v = v_ref[0].astype(jnp.float32)
        out_ref[0] = jax.lax.dot_general(
            p_mat[:], v, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).astype(out_ref.dtype)


def _pick_chunk(n: int) -> int:
    for c in _CHUNKS:
        if n % c == 0:
            return c
    if n <= 2048:  # whole-array trailing dim is always a legal block
        return n
    return 0


def mdta_attend_fused(q: jax.Array, k: jax.Array, v: jax.Array,
                      temperature: jax.Array, *,
                      interpret: bool = False) -> jax.Array:
    """q, k, v: (B, heads, c, N); temperature: (heads, 1, 1) -> (B, heads, c, N)."""
    b, heads, c, n = q.shape
    chunk = _pick_chunk(n)
    if chunk == 0 or c % 8 != 0:
        return _mdta_attend_jnp(q, k, v, temperature)

    bh = b * heads
    qf = q.reshape(bh, c, n)
    kf = k.reshape(bh, c, n)
    vf = v.reshape(bh, c, n)
    # temperature per flat (b, head) row, whole array in SMEM (Mosaic rejects
    # partial SMEM blocks), indexed by program_id inside the kernel.
    temp_flat = jnp.tile(temperature[:, 0, 0], (b,))

    grid = (bh, 2, n // chunk)
    # Index maps freeze to chunk 0 during the phase that doesn't consume the
    # tensor (q/k stream in phase 0, v in phase 1) — Mosaic's pipeline only
    # re-fetches when the block index changes, so each tensor crosses HBM
    # once (plus one stale chunk-0 fetch per phase) instead of twice.
    qk_spec = pl.BlockSpec(
        (1, c, chunk), lambda i, ph, nc: (i, 0, jnp.where(ph == 0, nc, 0)),
        memory_space=pltpu.VMEM)
    v_spec = pl.BlockSpec(
        (1, c, chunk), lambda i, ph, nc: (i, 0, jnp.where(ph == 1, nc, 0)),
        memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        _kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            qk_spec, qk_spec, v_spec,
        ],
        out_specs=pl.BlockSpec(
            (1, c, chunk), lambda i, ph, nc: (i, 0, jnp.where(ph == 1, nc, 0)),
            memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bh, c, n), v.dtype),
        scratch_shapes=[
            pltpu.VMEM((c, c), jnp.float32),
            pltpu.VMEM((c, 1), jnp.float32),
            pltpu.VMEM((c, 1), jnp.float32),
            pltpu.VMEM((c, c), jnp.float32),
        ],
        interpret=interpret,
    )(temp_flat, qf, kf, vf)
    return out.reshape(b, heads, c, n)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def mdta_attend_pallas(q, k, v, temperature, interpret=False):
    return mdta_attend_fused(q, k, v, temperature, interpret=interpret)


def _fwd(q, k, v, temperature, interpret):
    return mdta_attend_fused(q, k, v, temperature, interpret=interpret), \
        (q, k, v, temperature)


def _bwd(interpret, residuals, g):
    # Backward via the jnp reference (recompute): correctness first; a fused
    # backward kernel is a later optimization.
    q, k, v, temperature = residuals
    _, vjp = jax.vjp(_mdta_attend_jnp, q, k, v, temperature)
    return vjp(g)


mdta_attend_pallas.defvjp(_fwd, _bwd)
