"""Legacy MPRNet-backbone tests: param pins, forward shapes, quirks."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rcot_tpu.models.critic import init_fnet
from rcot_tpu.models.mprnet import (apply_mprnet_tnet, cab, init_cab,
                                    init_mprnet_tnet, prelu, sam, init_sam)
from rcot_tpu.models.restormer import count_params
from rcot_tpu.utils.config import CriticConfig

torch = pytest.importorskip("torch")


class TestParamPins:
    def test_legacy_tnet_pin(self):
        """6,842,689 measured from the reference Net.py:179-216."""
        p = init_mprnet_tnet(jax.random.PRNGKey(0))
        assert count_params(p) == 6_842_689

    @pytest.mark.slow
    def test_legacy_fnet_pin(self):
        """80,920,257: the Net.py critic is the same conv stack with a fixed
        32768->2048 head (Net.py:275)."""
        p = init_fnet(jax.random.PRNGKey(0),
                      CriticConfig(patch_size=256, fc_mid=2048))
        assert count_params(p) == 80_920_257

    def test_single_shared_prelu(self):
        p = init_mprnet_tnet(jax.random.PRNGKey(0))
        assert p["prelu_a"].shape == (1,)
        assert float(p["prelu_a"][0]) == pytest.approx(0.25)


class TestForward:
    @pytest.fixture(scope="class")
    def tiny(self):
        return init_mprnet_tnet(jax.random.PRNGKey(0), n_feat=16,
                                scale_unetfeats=8)

    def test_shapes_and_finiteness(self, tiny, rng):
        x = jnp.asarray(rng.uniform(size=(1, 32, 32, 3)).astype(np.float32))
        out2, out1, res = apply_mprnet_tnet(tiny, x)
        assert out2.shape == out1.shape == res.shape == x.shape
        assert np.isfinite(np.asarray(out2)).all()
        np.testing.assert_allclose(np.asarray(res), np.asarray(x - out1), atol=1e-6)

    def test_two_pass_differs(self, tiny, rng):
        x = jnp.asarray(rng.uniform(size=(1, 32, 32, 3)).astype(np.float32))
        out2, out1, _ = apply_mprnet_tnet(tiny, x)
        assert not np.allclose(np.asarray(out2), np.asarray(out1))

    def test_sr_mode_upscales(self, tiny, rng):
        x = jnp.asarray(rng.uniform(size=(1, 16, 16, 3)).astype(np.float32))
        out2, _, _ = apply_mprnet_tnet(tiny, x, sr_scale=4)
        assert out2.shape == (1, 64, 64, 3)

    def test_prelu_matches_torch(self, rng):
        x = rng.standard_normal((4, 5)).astype(np.float32)
        a = jnp.asarray([0.3])
        got = np.asarray(prelu(jnp.asarray(x), a))
        want = torch.nn.functional.prelu(torch.from_numpy(x),
                                         torch.tensor([0.3])).numpy()
        np.testing.assert_allclose(got, want, atol=1e-6)

    def test_cab_matches_torch_math(self, rng):
        """CAB vs a direct torch transcription (Net.py:36-72)."""
        n = 8
        p = init_cab(jax.random.PRNGKey(0), n, reduction=4)
        a = jnp.asarray([0.25])
        x = rng.standard_normal((1, 6, 6, n)).astype(np.float32)
        got = np.asarray(cab(p, jnp.asarray(x), a))

        def tw(w):
            return torch.from_numpy(np.transpose(np.asarray(w), (3, 2, 0, 1)))

        tx = torch.from_numpy(np.transpose(x, (0, 3, 1, 2)))
        h = torch.nn.functional.conv2d(tx, tw(p["conv1"]["w"]), padding=1)
        h = torch.nn.functional.prelu(h, torch.tensor([0.25]))
        res = torch.nn.functional.conv2d(h, tw(p["conv2"]["w"]), padding=1)
        y = torch.nn.functional.adaptive_avg_pool2d(res, 1)
        y = torch.relu(torch.nn.functional.conv2d(y, tw(p["ca_down"]["w"])))
        y = torch.sigmoid(torch.nn.functional.conv2d(y, tw(p["ca_up"]["w"])))
        want = (res * y + tx).numpy()
        np.testing.assert_allclose(got, np.transpose(want, (0, 2, 3, 1)),
                                   atol=1e-5)

    def test_bilinear_resample_matches_torch(self, rng):
        from rcot_tpu.models.mprnet import _resize_bilinear
        x = rng.standard_normal((1, 8, 8, 4)).astype(np.float32)
        got = np.asarray(_resize_bilinear(jnp.asarray(x), 4, 4))
        tx = torch.from_numpy(np.transpose(x, (0, 3, 1, 2)))
        want = torch.nn.functional.interpolate(
            tx, scale_factor=0.5, mode="bilinear", align_corners=False).numpy()
        np.testing.assert_allclose(got, np.transpose(want, (0, 2, 3, 1)),
                                   atol=1e-5)
        got_up = np.asarray(_resize_bilinear(jnp.asarray(x), 16, 16))
        want_up = torch.nn.functional.interpolate(
            tx, scale_factor=2, mode="bilinear", align_corners=False).numpy()
        np.testing.assert_allclose(got_up, np.transpose(want_up, (0, 2, 3, 1)),
                                   atol=1e-5)


class TestSRUpsampleParity:
    def test_bicubic_matches_torch_interpolate(self):
        """The legacy SR pre-upsample (Net.py:182-183) is torch
        F.interpolate mode='bicubic' align_corners=False — Keys a=-0.75.
        jax.image.resize 'cubic' is a=-0.5 (up to 0.068 off on [0,1]
        inputs), so the matrix-based resampler must match torch, not jax."""
        torch = pytest.importorskip("torch")
        import torch.nn.functional as F

        from rcot_tpu.models.mprnet import _upsample_bicubic_torch

        rng = np.random.default_rng(3)
        x = rng.uniform(size=(2, 8, 6, 3)).astype(np.float32)
        ours = np.asarray(_upsample_bicubic_torch(jnp.asarray(x), 4))
        ref = F.interpolate(torch.from_numpy(x).permute(0, 3, 1, 2),
                            scale_factor=4, mode="bicubic",
                            align_corners=False)
        ref = ref.permute(0, 2, 3, 1).numpy()
        np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-5)


class TestCondScaleWiring:
    def test_latent_cond_scale_reaches_the_mprnet_forward(self):
        """ModelConfig.latent_cond_scale must change the mprnet two-pass
        output (it silently did nothing on this backbone while the
        restormer honored it)."""
        import dataclasses

        from rcot_tpu.train.steps import make_model_apply
        from rcot_tpu.utils.config import Config, ModelConfig

        cfg = Config(model=ModelConfig(backbone="mprnet", mprnet_n_feat=8,
                                       mprnet_scale_feats=4,
                                       parity_params=False))
        p = init_mprnet_tnet(jax.random.PRNGKey(0), n_feat=8,
                             scale_unetfeats=4)
        x = jnp.asarray(np.random.default_rng(0).uniform(
            size=(1, 32, 32, 3)), jnp.float32)
        a = make_model_apply(cfg, full=True)(p, x)[0]
        cfg2 = cfg.replace(model=dataclasses.replace(
            cfg.model, latent_cond_scale=0.1))
        b = make_model_apply(cfg2, full=True)(p, x)[0]
        assert not np.allclose(np.asarray(a), np.asarray(b))
