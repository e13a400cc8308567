"""Model tests: parameter pins, shape contracts, two-pass structure."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rcot_tpu.models.critic import apply_fnet, init_fnet
from rcot_tpu.models.restormer import apply_tnet, count_params, init_tnet
from rcot_tpu.utils.config import CriticConfig, ModelConfig


class TestParamPins:
    def test_tnet_pin(self):
        """Exact parity with the reference's measured 46,853,150 params
        (SURVEY.md §6; instantiated from Net_Restormer.py:215-326)."""
        p = init_tnet(jax.random.PRNGKey(0), ModelConfig())
        assert count_params(p) == 46_853_150

    @pytest.mark.slow
    def test_fnet_pin_patch128(self):
        """Reference F_net at patch 128: 30,588,609 params
        (Net_Restormer.py:436-506)."""
        p = init_fnet(jax.random.PRNGKey(0), CriticConfig(patch_size=128))
        assert count_params(p) == 30_588_609

    def test_parity_params_flag_drops_dead_weight(self):
        full = count_params(init_tnet(jax.random.PRNGKey(0), ModelConfig()))
        lean = count_params(init_tnet(
            jax.random.PRNGKey(0), ModelConfig(parity_params=False)))
        assert lean < full


class TestTnetForward:
    def test_forward_contracts(self, tiny_model_cfg):
        """One forward pins three contracts (sharing the pass keeps the fast
        lane fast): output shapes, res == inp - out1 by construction
        (Net_Restormer.py:377), and pass 2 actually differing from pass 1."""
        p = init_tnet(jax.random.PRNGKey(1), tiny_model_cfg)
        x = jax.random.uniform(jax.random.PRNGKey(2), (2, 32, 32, 3))
        # jitted: eager-dispatch of the ~700-op forward costs ~15 s on this
        # 1-core box, while the persistent compile cache makes jit ~free on
        # every run after the first (eager==jit is pinned by
        # test_jit_consistency below)
        out2, out1, res = jax.jit(
            lambda p, x: apply_tnet(p, x, tiny_model_cfg))(p, x)
        assert out2.shape == out1.shape == res.shape == x.shape
        np.testing.assert_allclose(np.asarray(res), np.asarray(x - out1),
                                   atol=1e-6)
        assert not np.allclose(np.asarray(out2), np.asarray(out1))

    def test_mod8_contract(self, tiny_model_cfg):
        """H,W % 8 == 0 works; 40x24 is a valid non-square mod-8 shape."""
        p = init_tnet(jax.random.PRNGKey(0), tiny_model_cfg)
        out2, _, _ = jax.jit(lambda p, x: apply_tnet(p, x, tiny_model_cfg))(
            p, jnp.ones((1, 40, 24, 3)))
        assert out2.shape == (1, 40, 24, 3)

    @pytest.mark.slow
    def test_decoder_false_single_pass(self):
        cfg = ModelConfig(dim=8, num_blocks=(1, 1, 1, 1),
                          num_refinement_blocks=1, decoder=False,
                          parity_params=False)
        p = init_tnet(jax.random.PRNGKey(0), cfg)
        x = jax.random.uniform(jax.random.PRNGKey(1), (1, 32, 32, 3))
        out2, out1, _ = apply_tnet(p, x, cfg)
        np.testing.assert_array_equal(np.asarray(out2), np.asarray(out1))

    def test_jit_consistency(self, tiny_model_cfg):
        p = init_tnet(jax.random.PRNGKey(3), tiny_model_cfg)
        x = jax.random.uniform(jax.random.PRNGKey(4), (1, 32, 32, 3))
        eager = apply_tnet(p, x, tiny_model_cfg)[0]
        jitted = jax.jit(lambda p, x: apply_tnet(p, x, tiny_model_cfg))(p, x)[0]
        np.testing.assert_allclose(np.asarray(eager), np.asarray(jitted),
                                   atol=1e-5)

    @pytest.mark.slow
    def test_unused_parity_params_get_zero_grads(self):
        cfg = ModelConfig(dim=8, num_blocks=(1, 1, 1, 1),
                          num_refinement_blocks=1, parity_params=True)
        p = init_tnet(jax.random.PRNGKey(0), cfg)
        x = jax.random.uniform(jax.random.PRNGKey(1), (1, 16, 16, 3))
        g = jax.grad(lambda p: jnp.sum(apply_tnet(p, x, cfg)[0]))(p)
        unused_leaves = jax.tree_util.tree_leaves(g["unused"])
        assert all(float(jnp.abs(l).max()) == 0.0 for l in unused_leaves)
        used = jax.tree_util.tree_leaves(g["output"])
        assert any(float(jnp.abs(l).max()) > 0.0 for l in used)


class TestBlockStackVariants:
    """RCOT_SCAN_BLOCKS / RCOT_SCAN_MIN_BLOCKS / RCOT_REMAT are pure
    program-SHAPE levers against the sandbox's compile-helper wall
    (models/restormer.py block_stack, BENCH.md round 3) — every variant
    must match the unrolled default numerically, value and param-grad."""

    @pytest.fixture(scope="class")
    def multi_cfg(self):
        # stacks of 2/2/2/3 (+2 refinement) so the scan path actually
        # triggers, unlike tiny_model_cfg's single-block stacks
        return ModelConfig(dim=8, num_blocks=(2, 2, 2, 3),
                           num_refinement_blocks=2, heads=(1, 2, 4, 8),
                           parity_params=False)

    @pytest.fixture(scope="class")
    def baseline(self, multi_cfg):
        p = init_tnet(jax.random.PRNGKey(5), multi_cfg)
        x = jax.random.uniform(jax.random.PRNGKey(6), (1, 16, 16, 3))
        out, g = jax.jit(jax.value_and_grad(
            lambda p: jnp.sum(apply_tnet(p, x, multi_cfg)[0])))(p)
        return p, x, float(out), g

    def _run(self, multi_cfg, p, x):
        return jax.jit(jax.value_and_grad(
            lambda p: jnp.sum(apply_tnet(p, x, multi_cfg)[0])))(p)

    @pytest.mark.parametrize("env", [
        {"RCOT_SCAN_BLOCKS": "1"},
        {"RCOT_SCAN_BLOCKS": "1", "RCOT_SCAN_MIN_BLOCKS": "3"},
        {"RCOT_REMAT": "1"},
        {"RCOT_SCAN_BLOCKS": "1", "RCOT_REMAT": "1"},
    ], ids=["scan", "scan-latent-only", "remat", "scan+remat"])
    def test_variant_matches_unrolled(self, multi_cfg, baseline, env,
                                      monkeypatch):
        p, x, out_ref, g_ref = baseline
        for k, v in env.items():
            monkeypatch.setenv(k, v)
        out, g = self._run(multi_cfg, p, x)
        assert abs(float(out) - out_ref) < 1e-4 * max(1.0, abs(out_ref))
        jax.tree_util.tree_map(
            lambda a, b: np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=2e-4, atol=1e-5),
            g, g_ref)

    def test_min_blocks_above_max_stack_disables_scan(self, multi_cfg,
                                                      baseline, monkeypatch):
        """min_blocks > every stack size must take the unrolled path —
        bitwise-identical program, not just close."""
        p, x, out_ref, _ = baseline
        monkeypatch.setenv("RCOT_SCAN_BLOCKS", "1")
        monkeypatch.setenv("RCOT_SCAN_MIN_BLOCKS", "99")
        out, _ = self._run(multi_cfg, p, x)
        assert float(out) == out_ref


class TestCritic:
    def test_scalar_per_image(self):
        cfg = CriticConfig(patch_size=32)
        p = init_fnet(jax.random.PRNGKey(0), cfg)
        y = apply_fnet(p, jnp.ones((3, 32, 32, 3)), cfg)
        assert y.shape == (3,)

    def test_flatten_head_is_patch_bound(self):
        cfg = CriticConfig(patch_size=32)
        p = init_fnet(jax.random.PRNGKey(0), cfg)
        with pytest.raises(Exception):
            apply_fnet(p, jnp.ones((1, 64, 64, 3)), cfg)

    def test_pooled_head_is_resolution_agnostic(self):
        cfg = CriticConfig(patch_size=32, head="pooled")
        p = init_fnet(jax.random.PRNGKey(0), cfg)
        y32 = apply_fnet(p, jnp.ones((1, 32, 32, 3)), cfg)
        y64 = apply_fnet(p, jnp.ones((1, 64, 64, 3)), cfg)
        assert y32.shape == y64.shape == (1,)

    def test_fc_sizing_formula(self):
        """num_fea = patch^2/2 = 512*(patch/32)^2 (Net_Restormer.py:493-496).
        eval_shape: only the shapes matter, so skip materializing the 30M+
        params per patch size (was ~25 s of the fast lane)."""
        for patch in (64, 128):
            cfg = CriticConfig(patch_size=patch)
            p = jax.eval_shape(
                lambda k, cfg=cfg: init_fnet(k, cfg), jax.random.PRNGKey(0))
            assert p["fc"]["w"].shape[0] == patch * patch // 2


class TestCriticGuards:
    def test_flatten_head_requires_mod32_patch(self):
        import jax

        from rcot_tpu.models.critic import init_fnet
        from rcot_tpu.utils.config import CriticConfig

        with pytest.raises(ValueError, match="32"):
            init_fnet(jax.random.PRNGKey(0), CriticConfig(patch_size=100))
        with pytest.raises(ValueError, match="fc_mid"):
            init_fnet(jax.random.PRNGKey(0),
                      CriticConfig(head="pooled", fc_mid=2048))
