"""Kernel-dispatch policy tests (ops/dispatch.py): env switches and the
forward-only inference scope that lets block_mode() resolve compositions
whose backwards cannot co-compile (the gram+head+tail wall is a BACKWARD
constraint — an inference program has none, VERDICT r3 #3)."""

import numpy as np
import pytest

from rcot_tpu.ops import dispatch


class TestInferenceScope:
    def test_scope_depth_and_cleanup(self):
        assert not dispatch.in_inference_scope()
        with dispatch.inference_scope():
            assert dispatch.in_inference_scope()
            with dispatch.inference_scope():
                assert dispatch.in_inference_scope()
            assert dispatch.in_inference_scope()
        assert not dispatch.in_inference_scope()

    def test_scope_cleanup_on_exception(self):
        with pytest.raises(RuntimeError):
            with dispatch.inference_scope():
                raise RuntimeError("boom")
        assert not dispatch.in_inference_scope()

    def test_infer_block_env_only_applies_in_scope(self, monkeypatch):
        monkeypatch.delenv("RCOT_PALLAS_BLOCK", raising=False)
        monkeypatch.delenv("RCOT_PALLAS_GRAM", raising=False)
        monkeypatch.setenv("RCOT_INFER_BLOCK", "full")
        assert dispatch.block_mode() == "tail"  # training resolution
        with dispatch.inference_scope():
            assert dispatch.block_mode() == "full"
        assert dispatch.block_mode() == "tail"

    def test_explicit_block_env_wins_everywhere(self, monkeypatch):
        monkeypatch.setenv("RCOT_PALLAS_BLOCK", "head")
        monkeypatch.setenv("RCOT_INFER_BLOCK", "full")
        with dispatch.inference_scope():
            assert dispatch.block_mode() == "head"

    def test_infer_block_off(self, monkeypatch):
        monkeypatch.delenv("RCOT_PALLAS_BLOCK", raising=False)
        monkeypatch.setenv("RCOT_INFER_BLOCK", "off")
        with dispatch.inference_scope():
            assert dispatch.block_mode() == "off"

    @pytest.mark.slow
    def test_restorer_full_composition_matches_default(self, tiny_model_cfg,
                                                       monkeypatch):
        """The gram+FULL forward composition (head+tail kernels, interpret
        mode on CPU) must restore identically to the default gram+tail —
        value parity for the composition the inference probe evaluates."""
        import jax

        from rcot_tpu.models.inference import make_restorer
        from rcot_tpu.models.restormer import init_tnet

        params = init_tnet(jax.random.PRNGKey(0), tiny_model_cfg)
        rng = np.random.default_rng(0)
        img = rng.uniform(size=(40, 40, 3)).astype(np.float32)

        monkeypatch.setenv("RCOT_PALLAS", "1")
        dispatch.pallas_enabled.cache_clear()
        try:
            base = np.asarray(
                make_restorer(params, tiny_model_cfg)(img))
            monkeypatch.setenv("RCOT_INFER_BLOCK", "full")
            full = np.asarray(
                make_restorer(params, tiny_model_cfg)(img))
        finally:
            dispatch.pallas_enabled.cache_clear()
        np.testing.assert_allclose(full, base, rtol=2e-5, atol=2e-5)
