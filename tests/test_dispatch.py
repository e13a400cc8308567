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

    def test_infer_default_is_full(self, monkeypatch):
        """Forward-only default = FULL (head+tail kernels): the r4 inference
        composition matrix measured gram+FULL faster than gram+tail in every
        cell (256/512px, b1/b8, +4.5-5.8% — perf/probe_r4.jsonl); training
        resolution stays gram+tail (the backward co-compile wall)."""
        monkeypatch.delenv("RCOT_PALLAS_BLOCK", raising=False)
        monkeypatch.delenv("RCOT_PALLAS_GRAM", raising=False)
        monkeypatch.delenv("RCOT_INFER_BLOCK", raising=False)
        assert dispatch.block_mode() == "tail"
        with dispatch.inference_scope():
            assert dispatch.block_mode() == "full"
        assert dispatch.block_mode() == "tail"

    def test_scope_specific_env_wins_in_scope(self, monkeypatch):
        """With BOTH keys explicitly set, the scope-specific RCOT_INFER_BLOCK
        wins inside inference scope and RCOT_PALLAS_BLOCK everywhere else
        (advisor r4 low #3: the old order let a global key silently eat an
        explicit inference setting)."""
        monkeypatch.setenv("RCOT_PALLAS_BLOCK", "head")
        monkeypatch.setenv("RCOT_INFER_BLOCK", "full")
        with dispatch.inference_scope():
            assert dispatch.block_mode() == "full"
        assert dispatch.block_mode() == "head"

    def test_explicit_block_env_without_infer_key_wins_in_scope(
            self, monkeypatch):
        """An explicit RCOT_PALLAS_BLOCK alone still governs inference traces
        (no scope-specific override set)."""
        monkeypatch.setenv("RCOT_PALLAS_BLOCK", "head")
        monkeypatch.delenv("RCOT_INFER_BLOCK", raising=False)
        with dispatch.inference_scope():
            assert dispatch.block_mode() == "head"

    def test_infer_block_off(self, monkeypatch):
        monkeypatch.delenv("RCOT_PALLAS_BLOCK", raising=False)
        monkeypatch.setenv("RCOT_INFER_BLOCK", "off")
        with dispatch.inference_scope():
            assert dispatch.block_mode() == "off"

    @pytest.mark.slow
    def test_restorer_default_matches_block_off(self, tiny_model_cfg,
                                                monkeypatch):
        """The shipped forward-only default (gram+FULL since the r4 matrix
        settled it; head+tail kernels in interpret mode on CPU) must restore
        identically to the block-kernel-free composition — value parity for
        the composition users actually get from make_restorer."""
        import jax

        from rcot_tpu.models.inference import make_restorer
        from rcot_tpu.models.restormer import init_tnet

        params = init_tnet(jax.random.PRNGKey(0), tiny_model_cfg)
        rng = np.random.default_rng(0)
        img = rng.uniform(size=(40, 40, 3)).astype(np.float32)

        monkeypatch.setenv("RCOT_PALLAS", "1")
        monkeypatch.delenv("RCOT_INFER_BLOCK", raising=False)
        dispatch.pallas_enabled.cache_clear()
        try:
            shipped = np.asarray(
                make_restorer(params, tiny_model_cfg)(img))
            monkeypatch.setenv("RCOT_INFER_BLOCK", "off")
            base = np.asarray(
                make_restorer(params, tiny_model_cfg)(img))
        finally:
            dispatch.pallas_enabled.cache_clear()
        np.testing.assert_allclose(shipped, base, rtol=2e-5, atol=2e-5)
