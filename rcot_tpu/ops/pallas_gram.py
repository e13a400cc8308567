"""Transpose-free MDTA attention core: Gram accumulation + apply kernels.

Why: the measured cost of MDTA in-model is ~16 ms/iter of which the actual
attention math is ~3 ms (perf/probe_r2.jsonl ablations attn_all vs
attn_core) — the rest is the (B,HW,3,heads,ch) <-> (3,B,heads,ch,HW) head
relayouts XLA materializes around the einsum formulation (which round-1
measurement showed is the fastest JNP formulation in-graph; the slack is
only recoverable below XLA, here).

Design: MDTA's attention matrix is channel-by-channel (reference
Net_Restormer.py:42-45): softmax((q_hat @ k_hat^T) * temperature) with
q_hat, k_hat L2-normalized along SPATIAL. Both the Gram matrix and the
norms are plain sums over pixels, so they accumulate across row bands in
the qkv tensor's NATIVE NHWC layout — no transpose anywhere:

  kernel 1 (gram):  G_raw[b,h] += q_rows^T @ k_rows ;  nq += sum(q^2, rows);
                    nk += sum(k^2, rows)            (revisited-block accum)
  XLA glue (tiny, (B,heads,ch,ch)): G_hat = G_raw/(max(sqrt(nq),eps) x
                    max(sqrt(nk),eps)); attn = softmax(G_hat * temperature)
                    — exact: G_hat[c,d] = sum_n q[n,c]k[n,d]/(rq[c]rk[d]).
                    Autodiff of the normalize/softmax/temperature chain is
                    free (XLA, tiny tensors).
  kernel 2 (apply): out_rows[:, head h] = v_rows @ attn[h]^T

ONE custom VJP spans the whole core (kernel-per-op VJPs each emitted a
dense (B,H,W,3C) dqkv with a structurally-zero third, summed by XLA —
~3 redundant qkv-sized HBM passes per backward):
  apply bwd: dv_rows = da_rows @ attn[h]  (rowwise, emits ONLY dv) and
             dattn[h] += da_rows^T @ v_rows  (revisited-block accum);
  glue vjp (XLA, tiny): dattn -> dgram/dnq/dnk/dtemperature;
  gram bwd: dq[n,c] = sum_d dG[c,d] k[n,d] + 2 q[n,c] dnq[c]  (rowwise,
            emits ONLY [dq|dk]); dk symmetric;
  dqkv = concatenate([dq|dk, dv]).

eps semantics pinned to torch F.normalize (ops/attention.py): 1e-12.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .pallas_fused import _bwd_dot, _full_spec

_L2_EPS = 1e-12


def _row_block(th, w, c):
    return pl.BlockSpec((1, th, w, c), lambda b, r: (b, r, 0, 0),
                        memory_space=pltpu.VMEM)


def _acc_block(shape_tail):
    nd = len(shape_tail) + 1
    idx = lambda b, r: (b,) + (0,) * (nd - 1)  # noqa: E731
    return pl.BlockSpec((1,) + shape_tail, idx, memory_space=pltpu.VMEM)


def _pick_rows(h, w, c3, itemsize, budget=4 * 1024 * 1024):
    import os
    env = os.environ.get("RCOT_GRAM_VMEM_MB")
    if env:
        budget = int(float(env) * 1024 * 1024)
    for th in (128, 64, 32, 16, 8, 4, 2, 1):
        if h % th:
            continue
        if th * w * c3 * (itemsize + 4) <= budget:
            return th
    return 1


# ------------------------------------------------------------------- gram

def _gram_fwd_kernel(qkv, gram, nq, nk, *, heads, ch, th):
    r = pl.program_id(1)
    c = heads * ch
    flat = qkv[0].astype(jnp.float32).reshape(th * qkv.shape[2], 3 * c)

    @pl.when(r == 0)
    def _():
        gram[...] = jnp.zeros_like(gram)
        nq[...] = jnp.zeros_like(nq)
        nk[...] = jnp.zeros_like(nk)

    for h in range(heads):
        q = flat[:, h * ch:(h + 1) * ch]
        k = flat[:, c + h * ch:c + (h + 1) * ch]
        gram[0, h] += jax.lax.dot_general(
            q, k, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        nq[0, h] += jnp.sum(q * q, axis=0)
        nk[0, h] += jnp.sum(k * k, axis=0)


def mdta_gram_fwd(qkv: jax.Array, num_heads: int, *, interpret=False):
    b, hh, w, c3 = qkv.shape
    c = c3 // 3
    ch = c // num_heads
    th = _pick_rows(hh, w, c3, qkv.dtype.itemsize)
    kernel = functools.partial(_gram_fwd_kernel, heads=num_heads, ch=ch,
                               th=th)
    return pl.pallas_call(
        kernel,
        grid=(b, hh // th),
        in_specs=[_row_block(th, w, c3)],
        out_specs=(_acc_block((num_heads, ch, ch)),
                   _acc_block((num_heads, ch)),
                   _acc_block((num_heads, ch))),
        out_shape=(jax.ShapeDtypeStruct((b, num_heads, ch, ch), jnp.float32),
                   jax.ShapeDtypeStruct((b, num_heads, ch), jnp.float32),
                   jax.ShapeDtypeStruct((b, num_heads, ch), jnp.float32)),
        interpret=interpret,
    )(qkv)


def _gram_bwd_kernel(qkv, dgram, dnq, dnk, dqdk, *, heads, ch, th):
    c = heads * ch
    w = qkv.shape[2]
    flat = qkv[0].astype(jnp.float32).reshape(th * w, 3 * c)
    parts = []
    for h in range(heads):
        q = flat[:, h * ch:(h + 1) * ch]
        k = flat[:, c + h * ch:c + (h + 1) * ch]
        dg = dgram[0, h]
        dq = _bwd_dot(k, dg, ((1,), (1,)), tier="gram") + 2.0 * q * dnq[0, h][None]
        parts.append((dq, _bwd_dot(q, dg, ((1,), (0,)), tier="gram")
                      + 2.0 * k * dnk[0, h][None]))
    dq_all = jnp.concatenate([p[0] for p in parts], axis=-1)
    dk_all = jnp.concatenate([p[1] for p in parts], axis=-1)
    # only the [dq|dk] thirds — dv is structurally zero here and emitting a
    # dense 3C tensor cost a redundant qkv-sized HBM write (+ XLA's add with
    # the apply-bwd's dqkv, which carried the mirrored zeros)
    out = jnp.concatenate([dq_all, dk_all], axis=-1)
    dqdk[0] = out.reshape(th, w, 2 * c).astype(dqdk.dtype)


def mdta_gram_bwd(qkv, dgram, dnq, dnk, num_heads, *, interpret=False):
    """-> d[q|k] (B,H,W,2C); the caller concatenates the apply-bwd dv."""
    b, hh, w, c3 = qkv.shape
    c = c3 // 3
    ch = c // num_heads
    th = _pick_rows(hh, w, c3, qkv.dtype.itemsize)
    kernel = functools.partial(_gram_bwd_kernel, heads=num_heads, ch=ch,
                               th=th)
    return pl.pallas_call(
        kernel,
        grid=(b, hh // th),
        in_specs=[_row_block(th, w, c3),
                  _acc_block((num_heads, ch, ch)),
                  _acc_block((num_heads, ch)),
                  _acc_block((num_heads, ch))],
        out_specs=_row_block(th, w, 2 * c),
        out_shape=jax.ShapeDtypeStruct((b, hh, w, 2 * c), qkv.dtype),
        interpret=interpret,
    )(qkv, dgram, dnq, dnk)


# ------------------------------------------------------------------ apply

def _apply_fwd_kernel(qkv, attn, out, *, heads, ch, th):
    c = heads * ch
    w = qkv.shape[2]
    flat = qkv[0].reshape(th * w, 3 * c)
    parts = []
    for h in range(heads):
        v = flat[:, 2 * c + h * ch:2 * c + (h + 1) * ch]
        a = attn[0, h].astype(v.dtype)
        parts.append(jax.lax.dot_general(
            v, a, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32).astype(out.dtype))
    out[0] = jnp.concatenate(parts, axis=-1).reshape(th, w, c)


def attn_apply_fwd(qkv, attn, *, interpret=False):
    b, hh, w, c3 = qkv.shape
    c = c3 // 3
    heads = attn.shape[1]
    ch = c // heads
    th = _pick_rows(hh, w, c3, qkv.dtype.itemsize)
    kernel = functools.partial(_apply_fwd_kernel, heads=heads, ch=ch, th=th)
    return pl.pallas_call(
        kernel,
        grid=(b, hh // th),
        in_specs=[_row_block(th, w, c3), _acc_block((heads, ch, ch))],
        out_specs=_row_block(th, w, c),
        out_shape=jax.ShapeDtypeStruct((b, hh, w, c), qkv.dtype),
        interpret=interpret,
    )(qkv, attn)


def _apply_bwd_kernel(qkv, attn, g, dv_ref, dattn, *, heads, ch, th):
    r = pl.program_id(1)
    c = heads * ch
    w = qkv.shape[2]
    flat = qkv[0].reshape(th * w, 3 * c)
    gflat = g[0].reshape(th * w, c)

    @pl.when(r == 0)
    def _():
        dattn[...] = jnp.zeros_like(dattn)

    parts = []
    for h in range(heads):
        v = flat[:, 2 * c + h * ch:2 * c + (h + 1) * ch]
        da = gflat[:, h * ch:(h + 1) * ch]
        a = attn[0, h]
        parts.append(_bwd_dot(da, a, ((1,), (0,)), tier="gram"))
        dattn[0, h] += _bwd_dot(da, v, ((0,), (0,)), tier="gram")
    # only the dv third — the [dq|dk] thirds are structurally zero here
    # (see _gram_bwd_kernel's mirror-image note)
    dv_all = jnp.concatenate(parts, axis=-1)
    dv_ref[0] = dv_all.reshape(th, w, c).astype(dv_ref.dtype)


def attn_apply_bwd(qkv, attn, g, *, interpret=False):
    """-> (dv (B,H,W,C), dattn (B,heads,ch,ch))."""
    b, hh, w, c3 = qkv.shape
    c = c3 // 3
    heads = attn.shape[1]
    ch = c // heads
    th = _pick_rows(hh, w, c3, qkv.dtype.itemsize)
    kernel = functools.partial(_apply_bwd_kernel, heads=heads, ch=ch, th=th)
    return pl.pallas_call(
        kernel,
        grid=(b, hh // th),
        in_specs=[_row_block(th, w, c3), _acc_block((heads, ch, ch)),
                  _row_block(th, w, c)],
        out_specs=(_row_block(th, w, c), _acc_block((heads, ch, ch))),
        out_shape=(jax.ShapeDtypeStruct((b, hh, w, c), qkv.dtype),
                   jax.ShapeDtypeStruct((b, heads, ch, ch), jnp.float32)),
        interpret=interpret,
    )(qkv, attn, g)


# ------------------------------------------------------------ module-level

def _glue(gram, nq, nk, temperature):
    """The tiny (B,heads,ch,ch) normalize/temperature/softmax chain between
    the two kernels — plain XLA, differentiated by jax.vjp in the core's
    backward."""
    rq = jnp.maximum(jnp.sqrt(nq), _L2_EPS)
    rk = jnp.maximum(jnp.sqrt(nk), _L2_EPS)
    ghat = gram / (rq[..., :, None] * rk[..., None, :])
    temp = jnp.asarray(temperature).astype(jnp.float32)  # (heads, 1, 1)
    return jax.nn.softmax(ghat * temp[None], axis=-1)


def mdta_core_gram(temperature: jax.Array, qkv: jax.Array, num_heads: int,
                   *, interpret: bool = False) -> jax.Array:
    """Keyword-friendly wrapper: custom_vjp functions take positional args
    only (nondiff_argnums are positional indices).

    RCOT_GRAM_COMBINED=0 restores the split per-op VJP structure (each
    kernel's dqkv assembled with XLA-level zero thirds and summed by
    autodiff — the program shape the 0.0986 s/iter record was measured on,
    modulo in-kernel vs XLA zeros). Escape hatch in case the combined
    backward's program shape trips the remote compile helper on-chip."""
    from .dispatch import gram_combined_on
    if not gram_combined_on():
        gram, nq, nk = _gram_op(qkv, num_heads, interpret)
        return _apply_op(qkv, _glue(gram, nq, nk, temperature), interpret)
    return _mdta_core(temperature, qkv, num_heads, interpret)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2))
def _gram_op(qkv, num_heads, interpret=False):
    return mdta_gram_fwd(qkv, num_heads, interpret=interpret)


def _gram_op_fwd(qkv, num_heads, interpret):
    return mdta_gram_fwd(qkv, num_heads, interpret=interpret), qkv


def _gram_op_bwd(num_heads, interpret, qkv, gs):
    dgram, dnq, dnk = gs
    dqdk = mdta_gram_bwd(qkv, dgram, dnq, dnk, num_heads,
                         interpret=interpret)
    zeros_v = jnp.zeros(qkv.shape[:-1] + (qkv.shape[-1] // 3,), qkv.dtype)
    return (jnp.concatenate([dqdk, zeros_v], axis=-1),)


_gram_op.defvjp(_gram_op_fwd, _gram_op_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def _apply_op(qkv, attn, interpret=False):
    return attn_apply_fwd(qkv, attn, interpret=interpret)


def _apply_op_fwd(qkv, attn, interpret):
    return attn_apply_fwd(qkv, attn, interpret=interpret), (qkv, attn)


def _apply_op_bwd(interpret, res, g):
    qkv, attn = res
    dv, dattn = attn_apply_bwd(qkv, attn, g, interpret=interpret)
    zeros_qk = jnp.zeros(qkv.shape[:-1] + (2 * (qkv.shape[-1] // 3),),
                         qkv.dtype)
    return jnp.concatenate([zeros_qk, dv], axis=-1), dattn.astype(attn.dtype)


_apply_op.defvjp(_apply_op_fwd, _apply_op_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def _mdta_core(temperature: jax.Array, qkv: jax.Array, num_heads: int,
               interpret: bool = False) -> jax.Array:
    """Full MDTA attention core on NHWC qkv, no head-relayout transposes.

    Numerically identical to ops/attention.py mdta_attend (the Gram of
    L2-normalized rows equals the raw Gram scaled by the norms; eps pinned
    to torch F.normalize's 1e-12), with fp32 accumulation throughout.

    One custom_vjp spans the whole core: with separate per-kernel VJPs both
    backward kernels emitted a full dense (B,H,W,3C) dqkv whose complement
    thirds were structurally zero, and XLA summed them — roughly three
    redundant qkv-sized HBM passes per MDTA backward. Here the apply
    backward writes only dv, the gram backward writes only [dq|dk], and one
    concatenate assembles dqkv.
    """
    gram, nq, nk = mdta_gram_fwd(qkv, num_heads, interpret=interpret)
    return attn_apply_fwd(qkv, _glue(gram, nq, nk, temperature),
                          interpret=interpret)


def _core_vjp_fwd(temperature, qkv, num_heads, interpret):
    gram, nq, nk = mdta_gram_fwd(qkv, num_heads, interpret=interpret)
    attn = _glue(gram, nq, nk, temperature)
    out = attn_apply_fwd(qkv, attn, interpret=interpret)
    # residuals are small except qkv (needed by both backward kernels);
    # attn is recomputed from (gram, nq, nk) in the bwd so the glue's vjp
    # can be rebuilt there (vjp closures aren't storable residuals)
    return out, (qkv, gram, nq, nk, temperature)


def _core_vjp_bwd(num_heads, interpret, res, g):
    qkv, gram, nq, nk, temperature = res
    attn, glue_vjp = jax.vjp(_glue, gram, nq, nk, temperature)
    dv, dattn = attn_apply_bwd(qkv, attn, g, interpret=interpret)
    dgram, dnq, dnk, dtemp = glue_vjp(dattn)
    dqdk = mdta_gram_bwd(qkv, dgram, dnq, dnk, num_heads,
                         interpret=interpret)
    return dtemp, jnp.concatenate([dqdk, dv], axis=-1)


_mdta_core.defvjp(_core_vjp_fwd, _core_vjp_bwd)
