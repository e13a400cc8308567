"""Pallas depthwise-conv kernel tests (interpret mode) vs lax conv."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rcot_tpu.ops.conv import conv2d
from rcot_tpu.ops.pallas_dwconv import _pick_tile_h, dwconv3x3_fwd, dwconv3x3_pallas


def _ref(x, w):
    return conv2d({"w": w[:, :, None, :]}, x, groups=x.shape[-1])


class TestDwconvKernel:
    @pytest.mark.parametrize("shape", [
        (2, 16, 16, 48),     # level-1-ish
        (1, 8, 16, 254),     # GDFN hidden, odd channel count
        (3, 32, 16, 96),     # non-square
        (1, 4, 8, 8),        # tiny
    ])
    def test_fwd_matches_lax_conv(self, rng, shape):
        x = jnp.asarray(rng.standard_normal(shape).astype(np.float32))
        w = jnp.asarray(rng.standard_normal((3, 3, shape[-1])).astype(np.float32))
        got = dwconv3x3_fwd(x, w, interpret=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(_ref(x, w)),
                                   atol=1e-5)

    def test_gradients_match(self, rng):
        x = jnp.asarray(rng.standard_normal((1, 8, 8, 16)).astype(np.float32))
        w = jnp.asarray(rng.standard_normal((3, 3, 16)).astype(np.float32))

        gp = jax.grad(lambda x, w: jnp.sum(jnp.square(
            dwconv3x3_pallas(x, w, True))), argnums=(0, 1))(x, w)
        gr = jax.grad(lambda x, w: jnp.sum(jnp.square(_ref(x, w))),
                      argnums=(0, 1))(x, w)
        for a, b in zip(gp, gr):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=1e-4, rtol=1e-4)

    def test_bf16(self, rng):
        x = jnp.asarray(rng.standard_normal((1, 8, 8, 32)), jnp.bfloat16)
        w = jnp.asarray(rng.standard_normal((3, 3, 32)).astype(np.float32))
        got = dwconv3x3_fwd(x, w, interpret=True)
        assert got.dtype == jnp.bfloat16
        want = _ref(x.astype(jnp.float32), w)
        np.testing.assert_allclose(np.asarray(got, np.float32),
                                   np.asarray(want), atol=0.1, rtol=0.1)

    def test_pick_tile_divides(self):
        assert 128 % _pick_tile_h(128, 128, 254, 4) == 0
        assert _pick_tile_h(16, 16, 2042, 4) >= 2
