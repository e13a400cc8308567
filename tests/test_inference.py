"""Inference engine tests: padding, bucketing, tiled-vs-whole parity."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rcot_tpu.models.inference import (Restorer, bucket_size, crop_back,
                                       make_restorer, pad_to_multiple)
from rcot_tpu.models.restormer import init_tnet
from rcot_tpu.utils.config import ModelConfig


class TestPadding:
    def test_pad_to_multiple(self):
        x = jnp.ones((1, 100, 92, 3))
        padded, hw = pad_to_multiple(x, 8)
        assert padded.shape == (1, 104, 96, 3)
        assert hw == (100, 92)
        assert crop_back(padded, hw).shape == (1, 100, 92, 3)

    def test_already_aligned_is_identity(self):
        x = jnp.ones((1, 64, 64, 3))
        padded, hw = pad_to_multiple(x, 8)
        assert padded is x

    def test_bucket_size(self):
        assert bucket_size(100, 8, (128, 256)) == 128
        assert bucket_size(200, 8, (128, 256)) == 256
        assert bucket_size(300, 8, (128, 256)) == 304  # next mod-8 past buckets


class TestRestorer:
    @pytest.fixture(scope="class")
    def restorer_parts(self, tiny_model_cfg):
        params = init_tnet(jax.random.PRNGKey(0), tiny_model_cfg)
        return params, tiny_model_cfg

    def test_whole_image_odd_size(self, restorer_parts, rng):
        params, cfg = restorer_parts
        r = make_restorer(params, cfg)
        img = rng.uniform(size=(50, 46, 3)).astype(np.float32)
        out = r(img)
        assert out.shape == img.shape
        assert np.isfinite(out).all()

    def test_bucketing_reuses_program(self, restorer_parts, rng):
        """Two different sub-bucket sizes hit the same compiled shape."""
        params, cfg = restorer_parts
        r = make_restorer(params, cfg)
        r(rng.uniform(size=(100, 100, 3)).astype(np.float32))
        compiled_before = r._jitted._cache_size()
        r(rng.uniform(size=(120, 104, 3)).astype(np.float32))  # same 128-bucket
        assert r._jitted._cache_size() == compiled_before

    def test_out_scale_sr_shapes(self, rng):
        """Legacy SR mode (model upsamples inside the forward): outputs are
        (H*s, W*s) and padding crops scale with it; tiling + SR is refused."""
        def up2(x):  # stand-in for apply_mprnet_tnet(sr_scale=2)
            b, h, w, c = x.shape
            return jax.image.resize(x, (b, 2 * h, 2 * w, c), "nearest")

        r = Restorer(up2, out_scale=2)
        img = rng.uniform(size=(20, 26, 3)).astype(np.float32)  # off-mod-8
        out = r(img)
        assert out.shape == (40, 52, 3)
        outs = r.restore_batch([img, rng.uniform(size=(30, 18, 3)).astype(np.float32)])
        assert outs[0].shape == (40, 52, 3) and outs[1].shape == (60, 36, 3)
        with pytest.raises(ValueError, match="out_scale"):
            Restorer(up2, out_scale=2, tile=32)

    def test_tiled_matches_whole_for_shift_invariant_fn(self, rng):
        """With an elementwise model fn, tiled blending must be exact."""
        r = Restorer(lambda x: x * 0.5 + 0.1, tile=32, tile_overlap=8)
        img = rng.uniform(size=(80, 72, 3)).astype(np.float32)
        out = r(img)
        np.testing.assert_allclose(out, img * 0.5 + 0.1, atol=1e-6)

    @pytest.mark.slow
    def test_tiled_real_model_close_to_whole(self, restorer_parts, rng):
        """Overlap-tiled restoration approximates whole-image within a loose
        tolerance (boundary effects only)."""
        params, cfg = restorer_parts
        whole = make_restorer(params, cfg)
        tiled = make_restorer(params, cfg, tile=32, tile_overlap=16)
        img = rng.uniform(size=(64, 64, 3)).astype(np.float32)
        a = whole(img)
        b = tiled(img)
        # interior pixels (away from tile seams) should agree closely
        diff = np.abs(a - b).mean()
        assert diff < 0.05


class TestInferenceEdgeCases:
    def test_reflect_pad_size_one_dims_terminate(self):
        """Reflect cannot pad a size-1 dimension (no progress possible);
        the remainder must edge-replicate instead of looping forever."""
        from rcot_tpu.models.inference import _reflect_pad_hw
        x = jnp.arange(6, dtype=jnp.float32).reshape(1, 1, 2, 3)
        y = _reflect_pad_hw(x, 7, 6)
        assert y.shape == (1, 8, 8, 3)
        np.testing.assert_array_equal(np.asarray(y[0, :, 0]),
                                      np.tile(np.asarray(x[0, 0, 0]), (8, 1)))

    def test_tiled_overlap_wider_than_tile_still_runs(self, rng):
        """A narrow dimension can shrink the effective tile below the
        configured overlap; the stride used to go <= 0 and range() raised.
        The overlap now clamps so tiling still covers the image exactly."""
        r = Restorer(lambda x: x * 0.5 + 0.1, tile=128, tile_overlap=32)
        img = rng.uniform(size=(200, 33, 3)).astype(np.float32)  # t -> 32
        out = r(img)
        assert out.shape == img.shape
        np.testing.assert_allclose(out, img * 0.5 + 0.1, atol=1e-6)

    def test_tiled_sliver_image_falls_back_to_whole(self, rng):
        """One dimension thinner than a pad unit: no tile grid is possible —
        route through the bucketed whole-image path."""
        r = Restorer(lambda x: x * 2.0, tile=64, tile_overlap=16)
        img = rng.uniform(size=(300, 5, 3)).astype(np.float32)
        out = r(img)
        assert out.shape == img.shape
        np.testing.assert_allclose(out, img * 2.0, atol=1e-6)
