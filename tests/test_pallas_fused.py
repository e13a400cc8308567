"""Fused [1x1 -> dw3x3 -> gelu-gate -> 1x1] Pallas kernel vs jnp reference.

Runs in interpret mode on the CPU backend (tests/conftest.py). Shapes cover
aligned and UNALIGNED hidden sizes (the parity config's 2H=254 relies on the
wrapper's zero-channel re-split), multiple row tiles, and boundary rows.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rcot_tpu.ops.pallas_fused import (conv1x1_dw_fused, fused_dwconv,
                                       gdfn_fused)


def _ref_dw(x, dwk):
    return jax.lax.conv_general_dilated(
        x, dwk[:, :, None, :], (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=x.shape[-1])


def _ref_gdfn(x, w_in, dwk, w_out):
    h = jnp.einsum("bhwc,cm->bhwm", x, w_in)
    h = _ref_dw(h, dwk)
    half = dwk.shape[2] // 2
    g = jax.nn.gelu(h[..., :half], approximate=False) * h[..., half:]
    return jnp.einsum("bhwm,mc->bhwc", g, w_out)


def _rand(rng, *shape):
    return jnp.asarray(rng.standard_normal(shape).astype(np.float32) * 0.3)


class TestForward:
    @pytest.mark.parametrize("b,h,w,c,hid", [
        (1, 8, 16, 12, 16),    # aligned-ish tiny
        (2, 16, 8, 6, 7),      # odd hidden -> wrapper re-split path
        (1, 4, 4, 3, 127),     # the parity hidden size
    ])
    def test_gdfn_matches_reference(self, b, h, w, c, hid):
        rng = np.random.default_rng(0)
        x = _rand(rng, b, h, w, c)
        w_in = _rand(rng, c, 2 * hid)
        dwk = _rand(rng, 3, 3, 2 * hid)
        w_out = _rand(rng, hid, c)
        ours = gdfn_fused(x, w_in, dwk, w_out, interpret=True)
        ref = _ref_gdfn(x, w_in, dwk, w_out)
        np.testing.assert_allclose(np.asarray(ours), np.asarray(ref),
                                   rtol=2e-5, atol=2e-5)

    def test_conv1x1_dw_matches_reference(self):
        rng = np.random.default_rng(1)
        x = _rand(rng, 2, 8, 8, 10)
        w_in = _rand(rng, 10, 30)
        dwk = _rand(rng, 3, 3, 30)
        ours = conv1x1_dw_fused(x, w_in, dwk, interpret=True)
        ref = _ref_dw(jnp.einsum("bhwc,cm->bhwm", x, w_in), dwk)
        np.testing.assert_allclose(np.asarray(ours), np.asarray(ref),
                                   rtol=2e-5, atol=2e-5)

    def test_plain_dwconv(self):
        rng = np.random.default_rng(2)
        x = _rand(rng, 1, 16, 8, 24)
        dwk = _rand(rng, 3, 3, 24)
        ours = fused_dwconv(x, None, dwk, None, False, True)
        ref = _ref_dw(x, dwk)
        np.testing.assert_allclose(np.asarray(ours), np.asarray(ref),
                                   rtol=2e-5, atol=2e-5)


class TestInModel:
    @pytest.mark.slow
    def test_tnet_forward_identical_with_fused_path(self, tiny_model_cfg,
                                                    monkeypatch):
        """The dispatch-selected fused path must reproduce the jnp model
        bit-for-bit-ish on a full two-pass forward."""
        from rcot_tpu.models.restormer import apply_tnet, init_tnet
        from rcot_tpu.ops import dispatch

        params = init_tnet(jax.random.PRNGKey(0), tiny_model_cfg)
        x = _rand(np.random.default_rng(9), 1, 16, 16, 3) * 0.1 + 0.5

        monkeypatch.setenv("RCOT_PALLAS", "0")
        dispatch.pallas_enabled.cache_clear()
        base = apply_tnet(params, x, tiny_model_cfg)[0]

        monkeypatch.setenv("RCOT_PALLAS", "1")
        monkeypatch.setenv("RCOT_PALLAS_FUSED", "1")
        monkeypatch.setenv("RCOT_PALLAS_INTERPRET", "1")
        dispatch.pallas_enabled.cache_clear()
        fused = apply_tnet(params, x, tiny_model_cfg)[0]
        dispatch.pallas_enabled.cache_clear()

        np.testing.assert_allclose(np.asarray(fused), np.asarray(base),
                                   rtol=2e-5, atol=2e-5)


class TestBackward:
    def test_gdfn_grads_match_reference(self):
        rng = np.random.default_rng(3)
        b, h, w, c, hid = 1, 8, 8, 6, 8
        x = _rand(rng, b, h, w, c)
        w_in = _rand(rng, c, 2 * hid)
        dwk = _rand(rng, 3, 3, 2 * hid)
        w_out = _rand(rng, hid, c)
        cot = _rand(rng, b, h, w, c)

        def loss_ours(x, w_in, dwk, w_out):
            return jnp.sum(gdfn_fused(x, w_in, dwk, w_out, interpret=True)
                           * cot)

        def loss_ref(x, w_in, dwk, w_out):
            return jnp.sum(_ref_gdfn(x, w_in, dwk, w_out) * cot)

        g_ours = jax.grad(loss_ours, argnums=(0, 1, 2, 3))(x, w_in, dwk, w_out)
        g_ref = jax.grad(loss_ref, argnums=(0, 1, 2, 3))(x, w_in, dwk, w_out)
        for a, r, name in zip(g_ours, g_ref, ("dx", "dw_in", "ddwk", "dw_out")):
            np.testing.assert_allclose(np.asarray(a), np.asarray(r),
                                       rtol=1e-4, atol=1e-4, err_msg=name)

    def test_gdfn_grads_unaligned_hidden(self):
        rng = np.random.default_rng(4)
        b, h, w, c, hid = 1, 4, 6, 4, 5
        x = _rand(rng, b, h, w, c)
        w_in = _rand(rng, c, 2 * hid)
        dwk = _rand(rng, 3, 3, 2 * hid)
        w_out = _rand(rng, hid, c)

        def f(fn):
            return jax.grad(lambda *a: jnp.sum(jnp.sin(fn(*a))),
                            argnums=(0, 1, 2, 3))(x, w_in, dwk, w_out)

        g_ours = f(lambda *a: gdfn_fused(*a, interpret=True))
        g_ref = f(_ref_gdfn)
        for a, r in zip(g_ours, g_ref):
            np.testing.assert_allclose(np.asarray(a), np.asarray(r),
                                       rtol=1e-4, atol=1e-4)

    def test_qkv_path_grads(self):
        rng = np.random.default_rng(5)
        x = _rand(rng, 2, 8, 8, 6)
        w_in = _rand(rng, 6, 18)
        dwk = _rand(rng, 3, 3, 18)

        def f(fn):
            return jax.grad(lambda *a: jnp.sum(jnp.tanh(fn(*a))),
                            argnums=(0, 1, 2))(x, w_in, dwk)

        g_ours = f(lambda x, wi, dk: conv1x1_dw_fused(x, wi, dk,
                                                      interpret=True))
        g_ref = f(lambda x, wi, dk: _ref_dw(
            jnp.einsum("bhwc,cm->bhwm", x, wi), dk))
        for a, r in zip(g_ours, g_ref):
            np.testing.assert_allclose(np.asarray(a), np.asarray(r),
                                       rtol=1e-4, atol=1e-4)

    def test_plain_dwconv_grads(self):
        rng = np.random.default_rng(6)
        x = _rand(rng, 1, 8, 8, 16)
        dwk = _rand(rng, 3, 3, 16)

        def f(fn):
            return jax.grad(lambda *a: jnp.sum(jnp.cos(fn(*a))),
                            argnums=(0, 1))(x, dwk)

        g_ours = f(lambda x, dk: fused_dwconv(x, None, dk, None, False, True))
        g_ref = f(_ref_dw)
        for a, r in zip(g_ours, g_ref):
            np.testing.assert_allclose(np.asarray(a), np.asarray(r),
                                       rtol=1e-4, atol=1e-4)


class TestBwdBandBudget:
    def test_fp32_backward_picks_one_tile_rung_down(self):
        """fp32 activations shrink the backward band: at the 4 MB
        model-estimate budget the real scoped-VMEM stack of the
        [3,128,128,48]->192 qkv backward lands at 16.72M, over the TPU's
        16 MB limit (bf16 fits). The PRODUCTION selector (_bwd_th, the one
        fused_dwconv_bwd calls) must pick exactly one rung down for fp32 at
        that shape — th=8, not the over-shrunk th=4."""
        from rcot_tpu.ops.pallas_fused import _bwd_th
        assert _bwd_th(128, 128, 192, 2) == 16
        assert _bwd_th(128, 128, 192, 4) == 8

    def test_env_override_keeps_fp32_scale(self, monkeypatch):
        """RCOT_FUSED_VMEM_MB overrides the BASE budget only: the fp32
        scale still applies on top, so setting the knob back to 4 MB cannot
        reintroduce the fp32 VMEM overflow (th=16 at the crashing shape)."""
        from rcot_tpu.ops.pallas_fused import _bwd_th
        monkeypatch.setenv("RCOT_FUSED_VMEM_MB", "4")
        assert _bwd_th(128, 128, 192, 4) == 8

    def test_fp32_backward_grads_match_at_divergent_tile(self, monkeypatch):
        """Gradients at a shape/budget where fp32 genuinely selects a
        smaller row tile than bf16 would (th=4 vs 16 under a tiny base
        budget) still match the jnp reference — the band is a tiling
        choice only."""
        from rcot_tpu.ops.pallas_fused import _bwd_th
        monkeypatch.setenv("RCOT_FUSED_VMEM_MB", "0.02")
        assert _bwd_th(128, 8, 16, 4) < _bwd_th(128, 8, 16, 2)

        rng = np.random.default_rng(11)
        x = _rand(rng, 1, 128, 8, 6)
        w_in = _rand(rng, 6, 16)
        dwk = _rand(rng, 3, 3, 16)

        def ref(x, w_in, dwk):
            h = jnp.einsum("bhwc,cm->bhwm", x, w_in)
            return jnp.sum(_ref_dw(h, dwk) ** 2)

        def fused(x, w_in, dwk):
            return jnp.sum(
                fused_dwconv(x, w_in, dwk, None, False, True) ** 2)

        g_ref = jax.grad(ref, argnums=(0, 1, 2))(x, w_in, dwk)
        g_fus = jax.grad(fused, argnums=(0, 1, 2))(x, w_in, dwk)
        for a, b in zip(g_ref, g_fus):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=2e-4, atol=2e-4)


class TestCrashingLanePad:
    def test_m144_pad_exact_fwd_and_grads(self):
        """m=144 is the parity model's own level-1 qkv width (3*dim=144) and
        the one channel count whose backward crashes the remote compiler —
        conv1x1_dw_fused zero-pads it to 192 (_M_PAD) and slices back.
        Padded lanes carry zero weights and receive zero cotangents, so
        results must be EXACT vs the unpadded jnp reference."""
        from rcot_tpu.ops.pallas_fused import pad_crashing_m
        rng = np.random.default_rng(7)
        x = _rand(rng, 1, 8, 8, 48)
        w_in = _rand(rng, 48, 144)
        dwk = _rand(rng, 3, 3, 144)

        w_pad, dw_pad, m = pad_crashing_m(w_in, dwk)
        assert (m, w_pad.shape[1], dw_pad.shape[2]) == (144, 192, 192)

        from rcot_tpu.ops.pallas_fused import conv1x1_dw_fused

        def ref(x, w_in, dwk):
            h = jnp.einsum("bhwc,cm->bhwm", x, w_in)
            return jnp.sum(_ref_dw(h, dwk) ** 2)

        def fused(x, w_in, dwk):
            return jnp.sum(conv1x1_dw_fused(x, w_in, dwk, interpret=True) ** 2)

        out_f = conv1x1_dw_fused(x, w_in, dwk, interpret=True)
        h = jnp.einsum("bhwc,cm->bhwm", x, w_in)
        np.testing.assert_allclose(np.asarray(out_f), np.asarray(_ref_dw(h, dwk)),
                                   rtol=2e-5, atol=2e-5)
        g_ref = jax.grad(ref, argnums=(0, 1, 2))(x, w_in, dwk)
        g_fus = jax.grad(fused, argnums=(0, 1, 2))(x, w_in, dwk)
        for a, b in zip(g_ref, g_fus):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=2e-4, atol=2e-4)
