"""Training tests: torch-parity optimizers, loss gates, minimax step wiring."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from rcot_tpu.train.losses import gradient_penalty, t_loss, wgan_critic_loss
from rcot_tpu.train.optim import make_optimizer, step_decay_lr
from rcot_tpu.train.steps import (Batch, create_train_state,
                                  make_f_step, make_t_step,
                                  make_train_iteration)

torch = pytest.importorskip("torch")


class TestOptimParity:
    def _run_parity(self, name, torch_cls, steps=5):
        w0 = np.linspace(-1.0, 1.0, 12).astype(np.float32).reshape(3, 4)

        # torch trajectory: loss = sum(w * g_pattern) -> constant-ish grads
        tw = torch.nn.Parameter(torch.from_numpy(w0.copy()))
        topt = torch_cls([tw], lr=1e-2)
        for i in range(steps):
            topt.zero_grad()
            loss = ((tw * (i + 1)) ** 2).sum()
            loss.backward()
            topt.step()

        # jax trajectory with identical gradients
        tx = make_optimizer(name, 1e-2)
        params = {"w": jnp.asarray(w0)}
        state = tx.init(params)
        for i in range(steps):
            g = {"w": 2 * (i + 1) ** 2 * params["w"]}
            upd, state = tx.update(g, state, params)
            params = optax.apply_updates(params, upd)

        np.testing.assert_allclose(np.asarray(params["w"]), tw.detach().numpy(),
                                   rtol=1e-5, atol=1e-7)

    def test_rmsprop_matches_torch(self):
        self._run_parity("RMSprop", torch.optim.RMSprop)

    def test_adam_matches_torch(self):
        self._run_parity("Adam", torch.optim.Adam)

    def test_step_decay_schedule(self):
        # lr * 0.1**(epoch//step) with epoch-1 passed in (trainer.py:235).
        assert float(step_decay_lr(1e-4, 0, 20)) == pytest.approx(1e-4)
        assert float(step_decay_lr(1e-4, 19, 20)) == pytest.approx(1e-4)
        assert float(step_decay_lr(1e-4, 20, 20)) == pytest.approx(1e-5)
        assert float(step_decay_lr(1e-4, 40, 20)) == pytest.approx(1e-6, rel=1e-3)


class TestLosses:
    def test_wgan_loss(self):
        real = jnp.array([1.0, 3.0])
        fake = jnp.array([0.5, 1.5])
        assert float(wgan_critic_loss(real, fake)) == pytest.approx(-2.0 + 1.0)

    def test_paired_gate(self, rng):
        out = jnp.asarray(rng.uniform(size=(2, 8, 8, 3)).astype(np.float32))
        inp = jnp.asarray(rng.uniform(size=(2, 8, 8, 3)).astype(np.float32))
        tgt = jnp.asarray(rng.uniform(size=(2, 8, 8, 3)).astype(np.float32))
        de_id = jnp.array([3, 3], jnp.int32)
        score = jnp.array([0.0, 0.0])
        l_paired, aux = t_loss(out, inp, tgt, de_id, score, sigma=1.0,
                               Sigma=1e4, paired=jnp.array(True))
        l_unpaired, _ = t_loss(out, inp, tgt, de_id, score, sigma=1.0,
                               Sigma=1e4, paired=jnp.array(False))
        expect_gap = 1e4 * float(jnp.mean(jnp.abs(out - tgt)))
        assert float(l_paired - l_unpaired) == pytest.approx(expect_gap, rel=1e-5)

    def test_gradient_penalty_linear_critic(self):
        """For F(x) = <a, x>, grad norm is ||a|| everywhere, so
        GP = w * (||a|| - 1)^2 exactly."""
        a = jnp.full((1, 4, 4, 3), 0.5)

        def critic(x):
            return jnp.sum(x * a, axis=(1, 2, 3))

        real = jnp.ones((2, 4, 4, 3))
        fake = jnp.zeros((2, 4, 4, 3))
        gp = gradient_penalty(critic, real, fake, jax.random.PRNGKey(0), 10.0)
        norm = float(jnp.sqrt(jnp.sum(a ** 2)))
        assert float(gp) == pytest.approx(10.0 * (norm - 1.0) ** 2, rel=1e-5)


class TestSteps:
    @pytest.fixture(scope="class")
    def setup(self, tiny_config):
        key = jax.random.PRNGKey(0)
        state = create_train_state(key, tiny_config)
        batch = Batch(
            degraded=jax.random.uniform(jax.random.PRNGKey(1), (2, 32, 32, 3)),
            target=jax.random.uniform(jax.random.PRNGKey(2), (2, 32, 32, 3)),
            de_id=jnp.array([0, 3], jnp.int32),
        )
        return tiny_config, state, batch

    def test_f_step_updates_only_critic(self, setup):
        cfg, state, batch = setup
        new, metrics = jax.jit(make_f_step(cfg))(
            state, batch, jax.random.PRNGKey(3), jnp.float32(1e-4))
        # T params untouched
        t_same = jax.tree_util.tree_all(jax.tree_util.tree_map(
            lambda a, b: bool(jnp.array_equal(a, b)), state.t_params, new.t_params))
        assert t_same
        f_changed = any(
            not bool(jnp.array_equal(a, b))
            for a, b in zip(jax.tree_util.tree_leaves(state.f_params),
                            jax.tree_util.tree_leaves(new.f_params)))
        assert f_changed
        assert np.isfinite(float(metrics["f_wgan"]))
        assert np.isfinite(float(metrics["f_gp"]))

    @pytest.mark.slow
    def test_t_step_updates_only_transport(self, setup):
        cfg, state, batch = setup
        new, metrics = jax.jit(make_t_step(cfg))(
            state, batch, jnp.array(True), jnp.float32(5e-5))
        f_same = jax.tree_util.tree_all(jax.tree_util.tree_map(
            lambda a, b: bool(jnp.array_equal(a, b)), state.f_params, new.f_params))
        assert f_same
        assert int(new.step) == int(state.step) + 1
        assert np.isfinite(float(metrics["t_loss"]))

    @pytest.mark.slow
    def test_full_iteration_finite(self, setup):
        cfg, state, batch = setup
        it = jax.jit(make_train_iteration(cfg))
        s, m = it(state, batch, jax.random.PRNGKey(9), jnp.array(False),
                  jnp.float32(1e-4))
        for k, v in m.items():
            assert np.isfinite(float(v)), k

    @pytest.mark.slow  # the CAB-dense graph compiles ~2 min on CPU
    def test_full_iteration_mprnet_backbone(self, tiny_config):
        """The legacy MPRNet backbone trains through the same minimax
        iteration (cfg.model.backbone dispatch, train/steps.py): finite
        metrics and the T params actually move."""
        import dataclasses
        cfg = tiny_config.replace(model=dataclasses.replace(
            tiny_config.model, backbone="mprnet", mprnet_n_feat=8,
            mprnet_scale_feats=4))
        state = create_train_state(jax.random.PRNGKey(0), cfg)
        assert "prelu_a" in state.t_params  # mprnet pytree, not restormer
        batch = Batch(
            degraded=jax.random.uniform(jax.random.PRNGKey(1), (2, 32, 32, 3)),
            target=jax.random.uniform(jax.random.PRNGKey(2), (2, 32, 32, 3)),
            de_id=jnp.array([0, 3], jnp.int32),
        )
        s, m = jax.jit(make_train_iteration(cfg))(
            state, batch, jax.random.PRNGKey(9), jnp.array(True),
            jnp.float32(1e-4))
        for k, v in m.items():
            assert np.isfinite(float(v)), k
        t_changed = any(
            not bool(jnp.array_equal(a, b))
            for a, b in zip(jax.tree_util.tree_leaves(state.t_params),
                            jax.tree_util.tree_leaves(s.t_params)))
        assert t_changed

    @pytest.mark.slow
    def test_single_fwd_iteration_matches_two_fwd(self, setup, monkeypatch):
        """The hoisted-vjp single-T-forward iteration (train/steps.py,
        make_train_iteration docstring) is the same math as the naive
        f_step-then-t_step composition — metrics and post-step params must
        match bitwise up to XLA reassociation noise."""
        cfg, state, batch = setup
        args = (state, batch, jax.random.PRNGKey(7), jnp.array(True),
                jnp.float32(1e-4))
        monkeypatch.setenv("RCOT_SINGLE_FWD", "0")
        s_old, m_old = jax.jit(make_train_iteration(cfg))(*args)
        monkeypatch.setenv("RCOT_SINGLE_FWD", "1")
        s_new, m_new = jax.jit(make_train_iteration(cfg))(*args)
        for k in m_old:
            np.testing.assert_allclose(float(m_old[k]), float(m_new[k]),
                                       rtol=1e-5, atol=1e-6, err_msg=k)
        for a, b in zip(jax.tree_util.tree_leaves(s_old.t_params),
                        jax.tree_util.tree_leaves(s_new.t_params)):
            np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-7)
        for a, b in zip(jax.tree_util.tree_leaves(s_old.f_params),
                        jax.tree_util.tree_leaves(s_new.f_params)):
            np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-7)
