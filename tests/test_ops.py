"""Unit tests for the operator tier: jnp references vs independent numpy math
and vs torch-CPU semantics where torch is available."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rcot_tpu.ops.attention import init_mdta, mdta, mdta_attend
from rcot_tpu.ops.conv import conv2d, init_conv2d
from rcot_tpu.ops.fourier import fourier_residual_penalty, residual_rmse
from rcot_tpu.ops.gdfn import gdfn, hidden_features, init_gdfn
from rcot_tpu.ops.layernorm import init_layernorm, layernorm
from rcot_tpu.ops.resample import pixel_shuffle, pixel_unshuffle

torch = pytest.importorskip("torch")


def _np(x):
    return np.asarray(x)


class TestLayerNorm:
    def test_withbias_matches_torch_semantics(self, rng):
        x = rng.standard_normal((2, 4, 4, 16), dtype=np.float32)
        p = init_layernorm(16, bias=True)
        got = _np(layernorm(p, jnp.asarray(x)))
        t = torch.from_numpy(x)
        mu = t.mean(-1, keepdim=True)
        var = t.var(-1, keepdim=True, unbiased=False)
        want = ((t - mu) / torch.sqrt(var + 1e-5)).numpy()
        np.testing.assert_allclose(got, want, atol=1e-5)

    def test_biasfree_divides_by_std_only(self, rng):
        x = rng.standard_normal((2, 3, 3, 8), dtype=np.float32) + 5.0
        p = init_layernorm(8, bias=False)
        got = _np(layernorm(p, jnp.asarray(x)))
        var = x.var(-1, keepdims=True)  # biased
        want = x / np.sqrt(var + 1e-5)  # mean NOT subtracted
        np.testing.assert_allclose(got, want, atol=1e-5)


class TestConv:
    def test_conv2d_matches_torch(self, rng):
        x = rng.standard_normal((2, 8, 8, 5), dtype=np.float32)
        p = init_conv2d(jax.random.PRNGKey(0), 5, 7, 3, bias=True)
        got = _np(conv2d(p, jnp.asarray(x)))
        w = _np(p["w"])  # HWIO -> torch OIHW
        tw = torch.from_numpy(np.transpose(w, (3, 2, 0, 1)))
        tx = torch.from_numpy(np.transpose(x, (0, 3, 1, 2)))
        want = torch.nn.functional.conv2d(tx, tw, torch.from_numpy(_np(p["b"])),
                                          padding=1)
        want = np.transpose(want.numpy(), (0, 2, 3, 1))
        np.testing.assert_allclose(got, want, atol=1e-4)

    def test_depthwise_conv_matches_torch(self, rng):
        c = 6
        x = rng.standard_normal((1, 8, 8, c), dtype=np.float32)
        p = init_conv2d(jax.random.PRNGKey(1), c, c, 3, groups=c)
        got = _np(conv2d(p, jnp.asarray(x), groups=c))
        w = _np(p["w"])  # (3,3,1,c) -> torch (c,1,3,3)
        tw = torch.from_numpy(np.transpose(w, (3, 2, 0, 1)))
        tx = torch.from_numpy(np.transpose(x, (0, 3, 1, 2)))
        want = torch.nn.functional.conv2d(tx, tw, padding=1, groups=c)
        want = np.transpose(want.numpy(), (0, 2, 3, 1))
        np.testing.assert_allclose(got, want, atol=1e-4)

    def test_strided_4x4_matches_torch(self, rng):
        x = rng.standard_normal((1, 8, 8, 4), dtype=np.float32)
        p = init_conv2d(jax.random.PRNGKey(2), 4, 6, 4)
        got = _np(conv2d(p, jnp.asarray(x), stride=2, padding=1))
        tw = torch.from_numpy(np.transpose(_np(p["w"]), (3, 2, 0, 1)))
        tx = torch.from_numpy(np.transpose(x, (0, 3, 1, 2)))
        want = torch.nn.functional.conv2d(tx, tw, stride=2, padding=1)
        want = np.transpose(want.numpy(), (0, 2, 3, 1))
        assert got.shape == want.shape == (1, 4, 4, 6)
        np.testing.assert_allclose(got, want, atol=1e-4)


class TestPixelShuffle:
    def test_unshuffle_matches_torch(self, rng):
        x = rng.standard_normal((2, 6, 6, 4), dtype=np.float32)
        got = _np(pixel_unshuffle(jnp.asarray(x), 2))
        tx = torch.from_numpy(np.transpose(x, (0, 3, 1, 2)))
        want = torch.nn.functional.pixel_unshuffle(tx, 2).numpy()
        np.testing.assert_array_equal(got, np.transpose(want, (0, 2, 3, 1)))

    def test_shuffle_matches_torch(self, rng):
        x = rng.standard_normal((2, 3, 3, 8), dtype=np.float32)
        got = _np(pixel_shuffle(jnp.asarray(x), 2))
        tx = torch.from_numpy(np.transpose(x, (0, 3, 1, 2)))
        want = torch.nn.functional.pixel_shuffle(tx, 2).numpy()
        np.testing.assert_array_equal(got, np.transpose(want, (0, 2, 3, 1)))

    def test_roundtrip(self, rng):
        x = jnp.asarray(rng.standard_normal((1, 4, 4, 8), dtype=np.float32))
        np.testing.assert_array_equal(
            _np(pixel_shuffle(pixel_unshuffle(x, 2), 2)), _np(x))


class TestMDTA:
    def test_attend_matches_torch_math(self, rng):
        b, heads, c, n = 2, 2, 8, 32
        q = rng.standard_normal((b, heads, c, n), dtype=np.float32)
        k = rng.standard_normal((b, heads, c, n), dtype=np.float32)
        v = rng.standard_normal((b, heads, c, n), dtype=np.float32)
        temp = rng.standard_normal((heads, 1, 1), dtype=np.float32)
        got = _np(mdta_attend(*map(jnp.asarray, (q, k, v)), jnp.asarray(temp)))

        tq, tk, tv = map(torch.from_numpy, (q, k, v))
        tq = torch.nn.functional.normalize(tq, dim=-1)
        tk = torch.nn.functional.normalize(tk, dim=-1)
        attn = (tq @ tk.transpose(-2, -1)) * torch.from_numpy(temp)
        want = (attn.softmax(dim=-1) @ tv).numpy()
        np.testing.assert_allclose(got, want, atol=1e-5)

    def test_mdta_full_matches_torch_reference_math(self, rng):
        """Full MDTA (qkv conv + dwconv + attention + proj) vs a torch
        re-implementation of the reference block (Net_Restormer.py:19-50)."""
        dim, heads = 8, 2
        x = rng.standard_normal((1, 6, 6, dim), dtype=np.float32)
        p = init_mdta(jax.random.PRNGKey(0), dim, heads, bias=False)
        got = _np(mdta(p, jnp.asarray(x), heads))

        tx = torch.from_numpy(np.transpose(x, (0, 3, 1, 2)))
        w_qkv = torch.from_numpy(np.transpose(_np(p["qkv"]["w"]), (3, 2, 0, 1)))
        w_dw = torch.from_numpy(np.transpose(_np(p["qkv_dw"]["w"]), (3, 2, 0, 1)))
        w_proj = torch.from_numpy(np.transpose(_np(p["proj"]["w"]), (3, 2, 0, 1)))
        qkv = torch.nn.functional.conv2d(tx, w_qkv)
        qkv = torch.nn.functional.conv2d(qkv, w_dw, padding=1, groups=3 * dim)
        q, k, v = qkv.chunk(3, dim=1)
        bsz, _, h, w = q.shape
        ch = dim // heads

        def heads_split(t):
            return t.reshape(bsz, heads, ch, h * w)

        q, k, v = map(heads_split, (q, k, v))
        q = torch.nn.functional.normalize(q, dim=-1)
        k = torch.nn.functional.normalize(k, dim=-1)
        attn = (q @ k.transpose(-2, -1)) * torch.from_numpy(_np(p["temperature"]))
        out = (attn.softmax(dim=-1) @ v).reshape(bsz, dim, h, w)
        want = torch.nn.functional.conv2d(out, w_proj).numpy()
        np.testing.assert_allclose(got, np.transpose(want, (0, 2, 3, 1)), atol=1e-4)


class TestGDFN:
    def test_hidden_features_reference_sizes(self):
        assert [hidden_features(d, 2.66) for d in (48, 96, 192, 384)] == \
            [127, 255, 510, 1021]

    def test_gate_matches_torch(self, rng):
        dim = 8
        x = rng.standard_normal((1, 5, 5, dim), dtype=np.float32)
        p = init_gdfn(jax.random.PRNGKey(3), dim, 2.0, bias=False)
        got = _np(gdfn(p, jnp.asarray(x)))

        hid = hidden_features(dim, 2.0)
        tx = torch.from_numpy(np.transpose(x, (0, 3, 1, 2)))
        w_in = torch.from_numpy(np.transpose(_np(p["proj_in"]["w"]), (3, 2, 0, 1)))
        w_dw = torch.from_numpy(np.transpose(_np(p["dw"]["w"]), (3, 2, 0, 1)))
        w_out = torch.from_numpy(np.transpose(_np(p["proj_out"]["w"]), (3, 2, 0, 1)))
        h = torch.nn.functional.conv2d(tx, w_in)
        h = torch.nn.functional.conv2d(h, w_dw, padding=1, groups=2 * hid)
        x1, x2 = h.chunk(2, dim=1)
        want = torch.nn.functional.conv2d(
            torch.nn.functional.gelu(x1) * x2, w_out).numpy()
        np.testing.assert_allclose(got, np.transpose(want, (0, 2, 3, 1)), atol=1e-4)


class TestFourierCost:
    def test_reference_quirk_half_mean_power(self, rng):
        """de_id<3 term is (mean |F|^2)/2 — the precedence quirk, not an RMS."""
        res = rng.standard_normal((2, 8, 8, 3), dtype=np.float32)
        de_id = np.array([0, 1], np.int32)
        got = float(fourier_residual_penalty(jnp.asarray(res), jnp.asarray(de_id)))
        t = torch.from_numpy(np.transpose(res, (0, 3, 1, 2)))
        f = torch.fft.fft2(t)
        want = sum(float(torch.mean(torch.abs(f[i]) ** 2) ** 1 / 2) for i in range(2))
        assert got == pytest.approx(want, rel=1e-5)

    def test_paired_mean_magnitude(self, rng):
        res = rng.standard_normal((2, 8, 8, 3), dtype=np.float32)
        de_id = np.array([3, 4], np.int32)
        got = float(fourier_residual_penalty(jnp.asarray(res), jnp.asarray(de_id)))
        t = torch.from_numpy(np.transpose(res, (0, 3, 1, 2)))
        f = torch.fft.fft2(t)
        want = sum(float(torch.mean(torch.abs(f[i]))) for i in range(2))
        assert got == pytest.approx(want, rel=1e-5)

    def test_clean_math_is_rms(self, rng):
        res = rng.standard_normal((1, 8, 8, 3), dtype=np.float32)
        de_id = np.array([0], np.int32)
        got = float(fourier_residual_penalty(jnp.asarray(res), jnp.asarray(de_id),
                                             loss_math="clean"))
        f = np.fft.fft2(res[0], axes=(0, 1))
        want = np.sqrt(np.mean(np.abs(f) ** 2))
        assert got == pytest.approx(float(want), rel=1e-5)

    def test_residual_rmse(self, rng):
        res = rng.standard_normal((2, 4, 4, 3), dtype=np.float32)
        got = float(residual_rmse(jnp.asarray(res)))
        assert got == pytest.approx(float(np.sqrt(np.mean(res ** 2))), rel=1e-6)
