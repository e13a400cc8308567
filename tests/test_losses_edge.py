"""Edge-case loss tests: full de_id range, Sigma=0, bf16 inputs, GP keys."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rcot_tpu.ops.fourier import fourier_residual_penalty, residual_rmse
from rcot_tpu.train.losses import gradient_penalty, t_loss


class TestFourierEdge:
    def test_all_de_ids_finite(self, rng):
        """Every id 0..7 routes to a branch and stays finite."""
        res = jnp.asarray(rng.standard_normal((8, 8, 8, 3)).astype(np.float32))
        de_id = jnp.arange(8, dtype=jnp.int32)
        v = float(fourier_residual_penalty(res, de_id))
        assert np.isfinite(v)

    def test_batch_sum_is_additive(self, rng):
        res = jnp.asarray(rng.standard_normal((2, 8, 8, 3)).astype(np.float32))
        de_id = jnp.array([3, 3], jnp.int32)
        whole = float(fourier_residual_penalty(res, de_id))
        parts = sum(float(fourier_residual_penalty(res[i:i + 1], de_id[i:i + 1]))
                    for i in range(2))
        assert whole == pytest.approx(parts, rel=1e-5)

    def test_bf16_residual_upcasts(self, rng):
        res = jnp.asarray(rng.standard_normal((1, 8, 8, 3)), jnp.bfloat16)
        v = fourier_residual_penalty(res, jnp.array([0], jnp.int32))
        assert v.dtype == jnp.float32
        assert np.isfinite(float(v))
        assert residual_rmse(res).dtype == jnp.float32

    def test_zero_residual(self):
        res = jnp.zeros((1, 8, 8, 3))
        assert float(fourier_residual_penalty(res, jnp.array([0]))) == 0.0
        assert float(residual_rmse(res)) == 0.0


class TestTLossEdge:
    def test_sigma_zero_is_pure_adversarial(self, rng):
        out = jnp.asarray(rng.uniform(size=(1, 8, 8, 3)).astype(np.float32))
        inp = jnp.asarray(rng.uniform(size=(1, 8, 8, 3)).astype(np.float32))
        score = jnp.array([2.5])
        loss, _ = t_loss(out, inp, inp, jnp.array([3]), score, sigma=0.0,
                         Sigma=0.0, paired=jnp.array(False))
        assert float(loss) == pytest.approx(-2.5)

    def test_gradients_flow_through_all_terms(self, rng):
        inp = jnp.asarray(rng.uniform(size=(1, 8, 8, 3)).astype(np.float32))
        tgt = jnp.asarray(rng.uniform(size=(1, 8, 8, 3)).astype(np.float32))

        def f(out):
            loss, _ = t_loss(out, inp, tgt, jnp.array([0]), jnp.sum(out)[None],
                             sigma=1.0, Sigma=10.0, paired=jnp.array(True))
            return loss

        g = jax.grad(f)(inp * 0.9)
        assert np.isfinite(np.asarray(g)).all()
        assert float(jnp.abs(g).max()) > 0


class TestGPEdge:
    def test_different_keys_different_interpolants(self):
        a = jnp.full((1, 4, 4, 3), 0.3)

        def critic(x):
            return jnp.sum(jnp.square(x), axis=(1, 2, 3))

        real = jnp.ones((2, 4, 4, 3))
        fake = jnp.zeros((2, 4, 4, 3))
        g1 = float(gradient_penalty(critic, real, fake, jax.random.PRNGKey(0)))
        g2 = float(gradient_penalty(critic, real, fake, jax.random.PRNGKey(1)))
        assert g1 != g2  # alpha draw differs

    def test_unit_gradient_critic_zero_penalty(self):
        """F(x) = sum(x)/sqrt(D) has grad norm exactly 1 -> GP == 0."""
        d = 4 * 4 * 3

        def critic(x):
            return jnp.sum(x, axis=(1, 2, 3)) / jnp.sqrt(float(d))

        gp = gradient_penalty(critic, jnp.ones((3, 4, 4, 3)),
                              jnp.zeros((3, 4, 4, 3)), jax.random.PRNGKey(0))
        assert float(gp) == pytest.approx(0.0, abs=1e-9)
