"""Pallas kernel tests (interpret mode on CPU) vs the jnp reference twins."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rcot_tpu.ops.attention import mdta_attend
from rcot_tpu.ops.pallas_mdta import _pick_chunk, mdta_attend_fused, mdta_attend_pallas


class TestMDTAFused:
    @pytest.mark.parametrize("b,heads,c,n", [
        (1, 1, 48, 256),    # level-1-like
        (2, 2, 48, 128),    # level-2-like
        (1, 4, 96, 64),     # conditioning-block-like
        (2, 8, 48, 64),     # latent-like
    ])
    def test_matches_jnp_reference(self, rng, b, heads, c, n):
        q = jnp.asarray(rng.standard_normal((b, heads, c, n)).astype(np.float32))
        k = jnp.asarray(rng.standard_normal((b, heads, c, n)).astype(np.float32))
        v = jnp.asarray(rng.standard_normal((b, heads, c, n)).astype(np.float32))
        temp = jnp.asarray(rng.standard_normal((heads, 1, 1)).astype(np.float32))
        want = np.asarray(mdta_attend(q, k, v, temp))
        got = np.asarray(mdta_attend_fused(q, k, v, temp, interpret=True))
        np.testing.assert_allclose(got, want, atol=2e-5, rtol=1e-4)

    def test_multi_chunk_accumulation(self, rng):
        """n spanning several chunks exercises the two-phase accumulator."""
        q, k, v = (jnp.asarray(rng.standard_normal((1, 2, 24, 512)).astype(np.float32))
                   for _ in range(3))
        temp = jnp.ones((2, 1, 1), jnp.float32)
        want = np.asarray(mdta_attend(q, k, v, temp))
        got = np.asarray(mdta_attend_fused(q, k, v, temp, interpret=True))
        np.testing.assert_allclose(got, want, atol=2e-5, rtol=1e-4)

    def test_fallback_on_odd_shapes(self, rng):
        """c not multiple of 8 or huge ragged n falls back to the jnp path."""
        q, k, v = (jnp.asarray(rng.standard_normal((1, 1, 12, 100)).astype(np.float32))
                   for _ in range(3))
        temp = jnp.ones((1, 1, 1), jnp.float32)
        got = np.asarray(mdta_attend_fused(q, k, v, temp, interpret=True))
        want = np.asarray(mdta_attend(q, k, v, temp))
        np.testing.assert_allclose(got, want, atol=1e-6)

    def test_whole_array_chunk(self, rng):
        """Ragged n <= 2048 runs as a single whole-array chunk."""
        q, k, v = (jnp.asarray(rng.standard_normal((1, 1, 16, 200)).astype(np.float32))
                   for _ in range(3))
        temp = jnp.ones((1, 1, 1), jnp.float32)
        got = np.asarray(mdta_attend_fused(q, k, v, temp, interpret=True))
        want = np.asarray(mdta_attend(q, k, v, temp))
        np.testing.assert_allclose(got, want, atol=2e-5, rtol=1e-4)

    def test_gradients_match_reference(self, rng):
        q = jnp.asarray(rng.standard_normal((1, 2, 24, 128)).astype(np.float32))
        k = jnp.asarray(rng.standard_normal((1, 2, 24, 128)).astype(np.float32))
        v = jnp.asarray(rng.standard_normal((1, 2, 24, 128)).astype(np.float32))
        temp = jnp.ones((2, 1, 1), jnp.float32)

        def loss_pallas(q, k, v, t):
            return jnp.sum(jnp.square(mdta_attend_pallas(q, k, v, t, True)))

        def loss_ref(q, k, v, t):
            return jnp.sum(jnp.square(mdta_attend(q, k, v, t)))

        gp = jax.grad(loss_pallas, argnums=(0, 1, 2, 3))(q, k, v, temp)
        gr = jax.grad(loss_ref, argnums=(0, 1, 2, 3))(q, k, v, temp)
        for a, b in zip(gp, gr):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=5e-4, rtol=1e-3)

    def test_pick_chunk(self):
        assert _pick_chunk(16384) == 2048
        assert _pick_chunk(192) == 192   # whole-array trailing dim
        assert _pick_chunk(100) == 100
        assert _pick_chunk(3000) == 0    # ragged and too big for one block

    def test_bf16_inputs(self, rng):
        q, k, v = (jnp.asarray(rng.standard_normal((1, 1, 48, 128)),
                               jnp.bfloat16) for _ in range(3))
        temp = jnp.ones((1, 1, 1), jnp.float32)
        got = mdta_attend_fused(q, k, v, temp, interpret=True)
        assert got.dtype == jnp.bfloat16
        want = mdta_attend(q.astype(jnp.float32), k.astype(jnp.float32),
                           v.astype(jnp.float32), temp)
        np.testing.assert_allclose(np.asarray(got, np.float32),
                                   np.asarray(want), atol=0.05, rtol=0.05)
