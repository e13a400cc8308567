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
