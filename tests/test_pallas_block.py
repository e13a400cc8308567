"""Fused block kernels (ops/pallas_block.py) vs the pure-jnp path.

Interpret-mode on CPU (conftest sets RCOT_PALLAS_INTERPRET=1): forward and
gradients of both kernel configurations (head: LN+1x1+dw; tail:
pre-proj+residual+LN+GDFN+residual) must match the composed jnp reference
ops within fp32 tolerance (the kernel's erf polynomial is 1.5e-7 off torch's
exact erf — far below these tolerances).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rcot_tpu.ops.layernorm import layernorm
from rcot_tpu.ops.pallas_block import block_head, block_tail, fused_block


def _ln_params(c, bias, rng):
    p = {"w": jnp.asarray(rng.normal(1.0, 0.1, (c,)), jnp.float32)}
    if bias:
        p["b"] = jnp.asarray(rng.normal(0.0, 0.1, (c,)), jnp.float32)
    return p


def _dw_ref(h, dwk):
    """Depthwise 3x3, NHWC, same padding — jnp reference."""
    c = h.shape[-1]
    return jax.lax.conv_general_dilated(
        h, dwk[:, :, None, :], (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"), feature_group_count=c)


@pytest.fixture(params=[None, "0.001"], ids=["oneband", "multiband"])
def band_budget(request, monkeypatch):
    """None -> whole image in one row band; '0.001' MB -> TH=1, so every
    halo/masking path (including both out-of-image edges) is exercised.
    The block BACKWARDS ignore RCOT_FUSED_VMEM_MB by design (their
    per-shape budgets are crash-bisected), so their own knobs must be set
    too — otherwise the multiband case only shrinks the forward tile and
    the band5 masking / revisited-accumulator backward paths go untested."""
    if request.param is not None:
        for knob in ("RCOT_FUSED_VMEM_MB", "RCOT_TAIL_VMEM_MB",
                     "RCOT_HEAD_VMEM_MB"):
            monkeypatch.setenv(knob, request.param)
    return request.param


@pytest.mark.parametrize("ln_bias", [False, True])
def test_head_matches_reference(rng, ln_bias, band_budget):
    b, h, w, c = 2, 8, 8, 8
    m = 3 * c
    x = jnp.asarray(rng.normal(size=(b, h, w, c)), jnp.float32)
    ln = _ln_params(c, ln_bias, rng)
    w_qkv = jnp.asarray(rng.normal(0, 0.1, (c, m)), jnp.float32)
    dwk = jnp.asarray(rng.normal(0, 0.3, (3, 3, m)), jnp.float32)

    def fused(x, lw, lb, wq, dk):
        return block_head(x, lw, lb, wq, dk, interpret=True)

    def ref(x, lw, lb, wq, dk):
        p = {"w": lw} if lb is None else {"w": lw, "b": lb}
        u = layernorm(p, x)
        return _dw_ref(jnp.einsum("bhwc,cm->bhwm", u, wq), dk)

    args = (x, ln["w"], ln.get("b"), w_qkv, dwk)
    out_f = fused(*args)
    out_r = ref(*args)
    np.testing.assert_allclose(out_f, out_r, rtol=2e-5, atol=2e-5)

    cot = jnp.asarray(rng.normal(size=out_r.shape), jnp.float32)
    diffable = tuple(i for i, a in enumerate(args) if a is not None)
    gf = jax.grad(lambda *a: jnp.sum(fused(*a) * cot), argnums=diffable)(*args)
    gr = jax.grad(lambda *a: jnp.sum(ref(*a) * cot), argnums=diffable)(*args)
    for a, b_ in zip(gf, gr):
        np.testing.assert_allclose(a, b_, rtol=2e-4, atol=2e-4)


@pytest.mark.parametrize("tail_split", [False, True],
                         ids=["monolith", "split"])
@pytest.mark.parametrize("ln_bias", [False, True])
def test_tail_matches_reference(rng, ln_bias, band_budget, tail_split,
                                monkeypatch):
    if tail_split:
        # two slimmer kernels (dx/da + dW) instead of the monolithic
        # backward — same math, shared intermediates recomputed
        monkeypatch.setenv("RCOT_TAIL_SPLIT", "1")
    b, h, w, c = 2, 8, 8, 8
    hid = 11  # deliberately unaligned: exercises the gate-half zero padding
    x = jnp.asarray(rng.normal(size=(b, h, w, c)), jnp.float32)
    attn = jnp.asarray(rng.normal(size=(b, h, w, c)), jnp.float32)
    w_proj = jnp.asarray(rng.normal(0, 0.2, (c, c)), jnp.float32)
    ln = _ln_params(c, ln_bias, rng)
    w_in = jnp.asarray(rng.normal(0, 0.2, (c, 2 * hid)), jnp.float32)
    dwk = jnp.asarray(rng.normal(0, 0.3, (3, 3, 2 * hid)), jnp.float32)
    w_out = jnp.asarray(rng.normal(0, 0.2, (hid, c)), jnp.float32)

    def fused(x, attn, wp, lw, lb, wi, dk, wo):
        return block_tail(x, attn, wp, lw, lb, wi, dk, wo, interpret=True)

    def ref(x, attn, wp, lw, lb, wi, dk, wo):
        t = x + jnp.einsum("bhwa,ac->bhwc", attn, wp)
        p = {"w": lw} if lb is None else {"w": lw, "b": lb}
        u = layernorm(p, t)
        hh = _dw_ref(jnp.einsum("bhwc,cm->bhwm", u, wi), dk)
        x1, x2 = jnp.split(hh, 2, axis=-1)
        g = jax.nn.gelu(x1, approximate=False) * x2
        return t + jnp.einsum("bhwm,mc->bhwc", g, wo)

    args = (x, attn, w_proj, ln["w"], ln.get("b"), w_in, dwk, w_out)
    np.testing.assert_allclose(fused(*args), ref(*args), rtol=2e-5, atol=2e-5)

    cot = jnp.asarray(rng.normal(size=x.shape), jnp.float32)
    diffable = tuple(i for i, a in enumerate(args) if a is not None)
    gf = jax.grad(lambda *a: jnp.sum(fused(*a) * cot), argnums=diffable)(*args)
    gr = jax.grad(lambda *a: jnp.sum(ref(*a) * cot), argnums=diffable)(*args)
    for a, b_ in zip(gf, gr):
        np.testing.assert_allclose(a, b_, rtol=3e-4, atol=3e-4)


@pytest.mark.parametrize("mode", [
    pytest.param("1", marks=pytest.mark.slow),
    pytest.param("head", marks=pytest.mark.slow),
    "tail",  # the shipped TPU default composition stays in the fast lane
])
def test_transformer_block_fused_path(rng, monkeypatch, mode):
    """Whole transformer_block: every fused-block mode == the jnp path.
    mode "1" = head+tail kernels (gram off); mode "head" = head kernel +
    gram attention core + composed tail; mode "tail" = composed head +
    fused qkv + tail kernel (the shipped TPU default, ops/dispatch.py)."""
    from rcot_tpu.models.restormer import init_transformer_block, transformer_block
    dim, heads = 8, 2
    p = init_transformer_block(jax.random.PRNGKey(0), dim, heads, 2.66,
                               bias=False, ln_bias=True)
    x = jnp.asarray(rng.normal(size=(1, 8, 8, dim)), jnp.float32)

    ref = transformer_block(p, x, heads)
    monkeypatch.setenv("RCOT_PALLAS_BLOCK", mode)
    monkeypatch.setenv("RCOT_PALLAS_GRAM", "0" if mode == "1" else "1")
    monkeypatch.setenv("RCOT_PALLAS", "1")
    from rcot_tpu.ops import dispatch
    dispatch.pallas_enabled.cache_clear()
    try:
        out = transformer_block(p, x, heads)
        np.testing.assert_allclose(out, ref, rtol=2e-5, atol=2e-5)

        cot = jnp.asarray(rng.normal(size=x.shape), jnp.float32)
        gf = jax.grad(lambda q, y: jnp.sum(
            transformer_block(q, y, heads) * cot), argnums=(0, 1))(p, x)
        monkeypatch.setenv("RCOT_PALLAS", "0")
        dispatch.pallas_enabled.cache_clear()
        gr = jax.grad(lambda q, y: jnp.sum(
            transformer_block(q, y, heads) * cot), argnums=(0, 1))(p, x)
        flat_f = jax.tree_util.tree_leaves(gf)
        flat_r = jax.tree_util.tree_leaves(gr)
        assert len(flat_f) == len(flat_r)
        for a, b_ in zip(flat_f, flat_r):
            np.testing.assert_allclose(a, b_, rtol=3e-4, atol=3e-4)
    finally:
        dispatch.pallas_enabled.cache_clear()


class TestBwdBudgetIsolation:
    def test_fused_knob_cannot_clobber_block_budgets(self, monkeypatch):
        """The block backwards' per-shape band budgets are crash-bisected
        (larger tail bands HTTP-500 the remote compiler); the fused-tier
        RCOT_FUSED_VMEM_MB sweep knob must not override them. The block
        call sites pass env_override=False — pin that _pick_th then
        ignores the env entirely."""
        from rcot_tpu.ops.pallas_fused import _pick_th
        base = _pick_th(128, 128, 192, 2, budget=2 * 1024 * 1024,
                        env_override=False)
        monkeypatch.setenv("RCOT_FUSED_VMEM_MB", "64")
        assert _pick_th(128, 128, 192, 2, budget=2 * 1024 * 1024,
                        env_override=False) == base
        # and the fused tier itself still honors the knob
        assert _pick_th(128, 128, 192, 2, budget=2 * 1024 * 1024) > base
