"""NIQE tests (metrics/niqe.py): GGD/AGGD moment-matching estimators against
synthetic samples with known parameters, MSCN statistics, score ordering
under a surrogate pristine model, and the turnkey model loaders
(reference: util/val_utils.py:69-74 wraps skvideo.measure.niqe)."""

import math

import numpy as np
import pytest
from scipy.special import gamma as G

from rcot_tpu.metrics import niqe as nq


def sample_ggd(rng, alpha, sigma, n):
    """Exact GGD sampler: |x| = beta * Gamma(1/alpha,1)^(1/alpha), random
    sign; beta chosen so std(x) = sigma."""
    beta = sigma * math.sqrt(G(1 / alpha) / G(3 / alpha))
    mag = beta * rng.gamma(1 / alpha, 1.0, size=n) ** (1 / alpha)
    return mag * rng.choice([-1.0, 1.0], size=n)


def sample_aggd(rng, alpha, left_std, right_std, n):
    bl = left_std * math.sqrt(G(1 / alpha) / G(3 / alpha))
    br = right_std * math.sqrt(G(1 / alpha) / G(3 / alpha))
    mag = rng.gamma(1 / alpha, 1.0, size=n) ** (1 / alpha)
    neg = rng.uniform(size=n) < bl / (bl + br)
    return np.where(neg, -bl * mag, br * mag)


class TestEstimators:
    @pytest.mark.parametrize("alpha,sigma", [(2.0, 1.0), (1.0, 0.5),
                                             (0.7, 2.0), (3.5, 1.3)])
    def test_ggd_recovers_known_params(self, alpha, sigma):
        rng = np.random.default_rng(0)
        a_hat, s_hat = nq.estimate_ggd_param(
            sample_ggd(rng, alpha, sigma, 200_000))
        assert abs(a_hat - alpha) < 0.12 * alpha
        assert abs(s_hat - sigma) < 0.05 * sigma

    @pytest.mark.parametrize("alpha,l,r", [(2.0, 1.0, 1.0), (1.0, 0.4, 1.2),
                                           (0.8, 1.5, 0.5)])
    def test_aggd_recovers_known_params(self, alpha, l, r):
        rng = np.random.default_rng(1)
        a_hat, l_hat, r_hat = nq.estimate_aggd_param(
            sample_aggd(rng, alpha, l, r, 400_000))
        assert abs(a_hat - alpha) < 0.15 * alpha
        assert abs(l_hat - l) < 0.06 * l
        assert abs(r_hat - r) < 0.06 * r

    def test_ggd_degenerate_zero_vector(self):
        a, s = nq.estimate_ggd_param(np.zeros(100))
        assert s == 0.0 and np.isfinite(a)

    def test_white_noise_mscn_statistics(self):
        """MSCN of white noise: near-zero mean, bounded variance, and a GGD
        shape in the short-tailed band (alpha ~ 3: dividing each pixel by a
        local sigma estimated from a window CONTAINING it shrinks the tails
        below Gaussian — the natural-image alpha ~ 2 comes from structure,
        not from the transform)."""
        rng = np.random.default_rng(2)
        img = rng.normal(128, 30, size=(256, 256))
        coeffs, sigma = nq.mscn(img)
        inner = coeffs[8:-8, 8:-8]  # skip the zero-padded border
        assert abs(float(inner.mean())) < 0.02
        a, s = nq.estimate_ggd_param(inner)
        assert 2.0 < a < 4.0
        assert 0.3 < s < 1.5
        assert sigma.min() >= 0.0


class TestScore:
    def _pristine_set(self, rng, n=4):
        """Smooth natural-ish pristine images: low-pass filtered noise
        (broad spectrum, locally correlated — what MSCN models)."""
        from scipy.ndimage import gaussian_filter
        out = []
        for _ in range(n):
            base = gaussian_filter(rng.normal(0, 1, (192, 192)), 3.0)
            base = (base - base.min()) / (np.ptp(base) + 1e-9)
            fine = 0.25 * gaussian_filter(rng.normal(0, 1, (192, 192)), 1.0)
            out.append(np.clip(base + fine, 0, 1) * 255.0)
        return out

    def test_fit_and_score_ordering(self):
        """A pristine-like image must score LOWER (better) than the same
        image with heavy noise under a surrogate model — the relative
        monitoring contract."""
        rng = np.random.default_rng(3)
        model = nq.fit_niqe_model(self._pristine_set(rng))
        assert model["mu"].shape == (36,)
        assert model["cov"].shape == (36, 36)
        test = self._pristine_set(rng, n=1)[0]
        clean_score = nq.niqe(test, model)
        noisy = np.clip(test + rng.normal(0, 50, test.shape), 0, 255)
        noisy_score = nq.niqe(noisy, model)
        assert np.isfinite(clean_score) and np.isfinite(noisy_score)
        assert noisy_score > clean_score

    def test_rgb_and_01_range_inputs(self):
        rng = np.random.default_rng(4)
        model = nq.fit_niqe_model(self._pristine_set(rng))
        gray = self._pristine_set(rng, n=1)[0]
        rgb01 = np.repeat((gray / 255.0)[..., None], 3, axis=-1)
        # identical luminance -> identical score, whatever the layout
        assert nq.niqe(rgb01, model) == pytest.approx(nq.niqe(gray, model))

    def test_too_small_image_raises(self):
        rng = np.random.default_rng(5)
        model = {"mu": np.zeros(36), "cov": np.eye(36)}
        with pytest.raises(ValueError, match="smaller"):
            nq.niqe(rng.uniform(size=(64, 64)) * 255, model)

    def test_scoring_uses_all_patches(self):
        """Sharpness selection is a pristine-FIT step only (skvideo/MATLAB
        parity): a test image's feature matrix has one row per grid patch,
        however flat some patches are."""
        rng = np.random.default_rng(8)
        img = rng.uniform(size=(192, 192)) * 255
        img[:96, :96] = 128.0  # one completely flat patch
        assert nq.niqe_features(img).shape == (4, 36)
        # with the fit threshold, the flat patch is dropped
        assert nq.niqe_features(img, sharpness_threshold=0.75).shape[0] < 4

    def test_fit_skips_small_images_and_rejects_empty(self):
        rng = np.random.default_rng(9)
        good = [rng.uniform(size=(192, 192)) * 255 for _ in range(2)]
        small = rng.uniform(size=(64, 64)) * 255
        with pytest.warns(UserWarning, match="skipping image"):
            model = nq.fit_niqe_model(good + [small])
        assert model["mu"].shape == (36,)
        with pytest.raises(ValueError, match="no usable images"):
            nq.fit_niqe_model([small])
        with pytest.raises(ValueError, match="no usable images"):
            nq.fit_niqe_model([])


class TestModelIO:
    def test_npz_roundtrip(self, tmp_path):
        rng = np.random.default_rng(6)
        model = {"mu": rng.normal(size=36), "cov": np.eye(36),
                 "patch_size": 96}
        path = str(tmp_path / "m.npz")
        nq.save_niqe_model(path, model)
        loaded = nq.load_niqe_model(path)
        np.testing.assert_allclose(loaded["mu"], model["mu"])
        assert loaded["patch_size"] == 96

    def test_mat_turnkey_layouts(self, tmp_path):
        """Both known official .mat layouts load: pop_mu/pop_cov (skvideo's
        niqe_image_params) and mu_prisparam/cov_prisparam (MATLAB
        modelparameters.mat)."""
        import scipy.io as sio
        rng = np.random.default_rng(7)
        mu, cov = rng.normal(size=(1, 36)), np.eye(36)
        for keys in (("pop_mu", "pop_cov"),
                     ("mu_prisparam", "cov_prisparam")):
            path = str(tmp_path / f"{keys[0]}.mat")
            sio.savemat(path, {keys[0]: mu, keys[1]: cov})
            loaded = nq.load_niqe_model(path)
            np.testing.assert_allclose(loaded["mu"], mu.ravel())
        with pytest.raises(KeyError):
            bad = str(tmp_path / "bad.mat")
            sio.savemat(bad, {"something": mu})
            nq.load_niqe_model(bad)

    def test_quality_facade_requires_model(self):
        from rcot_tpu.metrics.quality import niqe as facade
        with pytest.raises(ValueError, match="pristine model"):
            facade(np.ones((128, 128)))
