"""Transpose-free MDTA core (ops/pallas_gram.py) vs the einsum twin.

Interpret-mode on CPU: the Gram-of-normalized-rows identity must reproduce
mdta_attend's normalize/attend/softmax exactly (fp32), including gradients
through qkv AND the learned temperature, for 1..4 heads and for a
non-multiple-of-lane head width (ch=24).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rcot_tpu.ops.attention import mdta_attend
from rcot_tpu.ops.pallas_gram import mdta_core_gram


def _twin(temp, qkv, num_heads):
    b, h, w, c3 = qkv.shape
    c = c3 // 3
    ch = c // num_heads
    q = qkv.reshape(b, h * w, 3, num_heads, ch)
    q = jnp.transpose(q, (2, 0, 3, 4, 1))
    out = mdta_attend(q[0], q[1], q[2], temp)
    return jnp.transpose(out, (0, 3, 1, 2)).reshape(b, h, w, c)


@pytest.mark.parametrize("heads,c,multiband", [
    (1, 8, False),  # fast-lane representative; the rest run in the slow lane
    # TH=1 -> 8 row bands: the @pl.when(r==0) accumulator inits and the
    # revisited-block '+=' in gram fwd / apply bwd only execute their
    # cross-band paths when the grid has >1 band (every real model shape;
    # the default tile at these tiny test shapes is one whole-image band)
    (1, 8, True),
    pytest.param(2, 16, False, marks=pytest.mark.slow),  # b=2 accum grid
    pytest.param(2, 16, True, marks=pytest.mark.slow),
    pytest.param(4, 96, False, marks=pytest.mark.slow),  # model-scale head
    pytest.param(4, 8, False, marks=pytest.mark.slow),
])
def test_gram_core_matches_twin(rng, heads, c, multiband, monkeypatch):
    if multiband:
        monkeypatch.setenv("RCOT_GRAM_VMEM_MB", "0.0001")
    # batch 1 keeps interpret-mode grad time down, but ONE case runs b=2 so
    # the per-batch accumulator grid indexing stays covered
    b = 2 if (heads, c) == (2, 16) else 1
    h, w = 8, 8
    qkv = jnp.asarray(rng.normal(size=(b, h, w, 3 * c)), jnp.float32)
    temp = jnp.asarray(rng.normal(1.0, 0.2, (heads, 1, 1)), jnp.float32)

    out_g = mdta_core_gram(temp, qkv, heads, interpret=True)
    out_t = _twin(temp, qkv, heads)
    np.testing.assert_allclose(out_g, out_t, rtol=2e-5, atol=2e-5)

    cot = jnp.asarray(rng.normal(size=out_t.shape), jnp.float32)
    gg = jax.grad(lambda t, q: jnp.sum(
        mdta_core_gram(t, q, heads, interpret=True) * cot),
        argnums=(0, 1))(temp, qkv)
    gt = jax.grad(lambda t, q: jnp.sum(_twin(t, q, heads) * cot),
                  argnums=(0, 1))(temp, qkv)
    np.testing.assert_allclose(gg[0], gt[0], rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(gg[1], gt[1], rtol=2e-4, atol=2e-4)


def test_mdta_module_gram_flag(rng, monkeypatch):
    """Whole mdta op with RCOT_PALLAS_GRAM=1 == default path (fwd + grads
    through params and input)."""
    from rcot_tpu.ops.attention import init_mdta, mdta
    from rcot_tpu.ops import dispatch
    dim, heads = 16, 2
    p = init_mdta(jax.random.PRNGKey(0), dim, heads, bias=False)
    x = jnp.asarray(rng.normal(size=(1, 8, 8, dim)), jnp.float32)
    ref = mdta(p, x, heads)
    cot = jnp.asarray(rng.normal(size=ref.shape), jnp.float32)
    gr = jax.grad(lambda q, y: jnp.sum(mdta(q, y, heads) * cot),
                  argnums=(0, 1))(p, x)

    monkeypatch.setenv("RCOT_PALLAS_GRAM", "1")
    monkeypatch.setenv("RCOT_PALLAS", "1")
    dispatch.pallas_enabled.cache_clear()
    try:
        out = mdta(p, x, heads)
        np.testing.assert_allclose(out, ref, rtol=2e-5, atol=2e-5)
        gf = jax.grad(lambda q, y: jnp.sum(mdta(q, y, heads) * cot),
                      argnums=(0, 1))(p, x)
        for a, b in zip(jax.tree_util.tree_leaves(gf),
                        jax.tree_util.tree_leaves(gr)):
            np.testing.assert_allclose(a, b, rtol=3e-4, atol=3e-4)
    finally:
        dispatch.pallas_enabled.cache_clear()


def test_block_mode_resolution(monkeypatch):
    """block_mode(): explicit values win; the default resolves against the
    gram tier (gram + head + tail backwards cannot all co-compile on the
    current toolchain; gram + tail-only can, and wins —
    ops/dispatch.py block_mode docstring)."""
    from rcot_tpu.ops import dispatch

    monkeypatch.delenv("RCOT_PALLAS_BLOCK", raising=False)
    monkeypatch.delenv("RCOT_PALLAS_GRAM", raising=False)
    assert dispatch.block_mode() == "tail"  # gram defaults ON
    monkeypatch.setenv("RCOT_PALLAS_GRAM", "0")
    assert dispatch.block_mode() == "full"
    monkeypatch.setenv("RCOT_PALLAS_BLOCK", "0")
    assert dispatch.block_mode() == "off"
    assert not dispatch.pallas_block_on()
    monkeypatch.setenv("RCOT_PALLAS_BLOCK", "head")
    assert dispatch.block_mode() == "head"
    monkeypatch.setenv("RCOT_PALLAS_BLOCK", "tail")
    assert dispatch.block_mode() == "tail"
    monkeypatch.setenv("RCOT_PALLAS_BLOCK", "1")
    assert dispatch.block_mode() == "full"
    assert dispatch.pallas_block_on()


def test_combined_and_split_bwd_structures_agree(rng, monkeypatch):
    """RCOT_GRAM_COMBINED=0 (the split per-op VJP escape hatch for the
    remote-compiler wall) must produce identical outputs and gradients to
    the combined-VJP default."""
    heads, c = 2, 16
    qkv = jnp.asarray(rng.normal(size=(1, 8, 8, 3 * c)), jnp.float32)
    temp = jnp.asarray(rng.normal(1.0, 0.2, (heads, 1, 1)), jnp.float32)
    cot = jnp.asarray(rng.normal(size=(1, 8, 8, c)), jnp.float32)

    def grads():
        return jax.grad(lambda t, q: jnp.sum(
            mdta_core_gram(t, q, heads, interpret=True) * cot),
            argnums=(0, 1))(temp, qkv)

    out_comb = mdta_core_gram(temp, qkv, heads, interpret=True)
    g_comb = grads()
    monkeypatch.setenv("RCOT_GRAM_COMBINED", "0")
    out_split = mdta_core_gram(temp, qkv, heads, interpret=True)
    g_split = grads()
    np.testing.assert_allclose(out_split, out_comb, rtol=1e-6, atol=1e-6)
    for a, b in zip(g_comb, g_split):
        np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-5)
