"""Metric parity tests: PSNR formula, reference-SSIM vs real cv2 math."""

import jax.numpy as jnp
import numpy as np
import pytest

from rcot_tpu.metrics.quality import (AverageMeter, psnr, ssim_ref_single,
                                      ssim_skimage_single)

cv2 = pytest.importorskip("cv2")


def reference_ssim_cv2(img1, img2):
    """Direct transcription of the reference math (evaluate.py:53-73) using
    real cv2 calls, as the parity oracle."""
    c1 = (0.01 * 255) ** 2
    c2 = (0.03 * 255) ** 2
    img1 = img1.astype(np.float64)
    img2 = img2.astype(np.float64)
    kernel = cv2.getGaussianKernel(2, 1)
    window = np.outer(kernel, kernel.transpose())
    mu1 = cv2.filter2D(img1, -1, window)[5:-5, 5:-5]
    mu2 = cv2.filter2D(img2, -1, window)[5:-5, 5:-5]
    mu1_sq, mu2_sq, mu1_mu2 = mu1 ** 2, mu2 ** 2, mu1 * mu2
    s1 = cv2.filter2D(img1 ** 2, -1, window)[5:-5, 5:-5] - mu1_sq
    s2 = cv2.filter2D(img2 ** 2, -1, window)[5:-5, 5:-5] - mu2_sq
    s12 = cv2.filter2D(img1 * img2, -1, window)[5:-5, 5:-5] - mu1_mu2
    m = ((2 * mu1_mu2 + c1) * (2 * s12 + c2)) / (
        (mu1_sq + mu2_sq + c1) * (s1 + s2 + c2))
    return m.mean()


class TestPSNR:
    def test_known_value(self):
        a = jnp.zeros((8, 8, 3))
        b = jnp.full((8, 8, 3), 0.1)
        got = float(psnr(a, b, 1.0))
        assert got == pytest.approx(20.0, rel=1e-4)  # 10*log10(1/0.01)

    def test_matches_formula(self, rng):
        a = rng.uniform(size=(16, 16, 3)).astype(np.float32)
        b = rng.uniform(size=(16, 16, 3)).astype(np.float32)
        want = 10 * np.log10(1.0 / np.mean((a - b) ** 2))
        assert float(psnr(jnp.asarray(a), jnp.asarray(b))) == \
            pytest.approx(float(want), rel=1e-5)


class TestSSIMRef:
    def test_matches_cv2_oracle_gray(self, rng):
        a = rng.uniform(0, 255, (32, 32)).astype(np.float32)
        b = np.clip(a + rng.normal(0, 10, a.shape), 0, 255).astype(np.float32)
        got = float(ssim_ref_single(jnp.asarray(a), jnp.asarray(b)))
        want = reference_ssim_cv2(a, b)
        assert got == pytest.approx(want, abs=1e-4)

    def test_matches_cv2_oracle_color(self, rng):
        a = rng.uniform(0, 255, (24, 24, 3)).astype(np.float32)
        b = np.clip(a + rng.normal(0, 20, a.shape), 0, 255).astype(np.float32)
        got = float(ssim_ref_single(jnp.asarray(a), jnp.asarray(b)))
        want = reference_ssim_cv2(a, b)
        assert got == pytest.approx(want, abs=1e-4)

    def test_identical_images_near_one(self, rng):
        a = rng.uniform(0, 255, (32, 32, 3)).astype(np.float32)
        assert float(ssim_ref_single(jnp.asarray(a), jnp.asarray(a))) == \
            pytest.approx(1.0, abs=1e-6)


class TestSSIMSkimage:
    def test_identical_is_one(self, rng):
        a = rng.uniform(size=(32, 32, 3)).astype(np.float32)
        assert float(ssim_skimage_single(jnp.asarray(a), jnp.asarray(a))) == \
            pytest.approx(1.0, abs=1e-6)

    def test_degrades_with_noise(self, rng):
        a = rng.uniform(size=(32, 32)).astype(np.float32)
        small = np.clip(a + rng.normal(0, 0.05, a.shape), 0, 1).astype(np.float32)
        big = np.clip(a + rng.normal(0, 0.3, a.shape), 0, 1).astype(np.float32)
        s_small = float(ssim_skimage_single(jnp.asarray(a), jnp.asarray(small)))
        s_big = float(ssim_skimage_single(jnp.asarray(a), jnp.asarray(big)))
        assert 0 < s_big < s_small < 1

    def test_matches_skimage_if_available(self, rng):
        skimage_metrics = pytest.importorskip("skimage.metrics")
        a = rng.uniform(size=(32, 32)).astype(np.float32)
        b = np.clip(a + rng.normal(0, 0.1, a.shape), 0, 1).astype(np.float32)
        want = skimage_metrics.structural_similarity(a, b, data_range=1.0)
        got = float(ssim_skimage_single(jnp.asarray(a), jnp.asarray(b)))
        assert got == pytest.approx(float(want), abs=1e-5)


class TestAverageMeter:
    def test_running_mean(self):
        m = AverageMeter()
        m.update(1.0)
        m.update(2.0, n=3)
        assert m.avg == pytest.approx(7.0 / 4.0)


class TestPeakMaxEdges:
    def test_batched_shave_and_identical_cap(self):
        """shave_border must cut H/W (not the batch axis) on (B,H,W,C)
        inputs, and identical images return the 100 dB cap, not inf."""
        import jax.numpy as jnp

        from rcot_tpu.metrics.quality import psnr_peak_max

        rng = np.random.default_rng(0)
        a = jnp.asarray(rng.uniform(size=(2, 16, 16, 3)), jnp.float32)
        b = jnp.asarray(rng.uniform(size=(2, 16, 16, 3)), jnp.float32)
        v = float(psnr_peak_max(a, b, shave_border=2))
        assert np.isfinite(v)
        assert float(psnr_peak_max(a, a)) == 100.0
