"""FID tests: Frechet math vs closed forms, statistics, inception shapes."""

import numpy as np
import pytest

from rcot_tpu.metrics.frechet import (activation_statistics, frechet_distance,
                                      load_stats, save_stats)


class TestFrechet:
    def test_identical_gaussians_zero(self, rng):
        mu = rng.standard_normal(16)
        a = rng.standard_normal((16, 16))
        sigma = a @ a.T + np.eye(16)
        assert frechet_distance(mu, sigma, mu, sigma) == pytest.approx(0.0, abs=1e-6)

    def test_mean_shift_closed_form(self, rng):
        """Same covariance, shifted mean: d^2 = ||dmu||^2."""
        a = rng.standard_normal((8, 8))
        sigma = a @ a.T + np.eye(8)
        mu1 = np.zeros(8)
        mu2 = np.full(8, 0.5)
        want = float(np.sum((mu1 - mu2) ** 2))
        assert frechet_distance(mu1, sigma, mu2, sigma) == pytest.approx(want, rel=1e-6)

    def test_diagonal_closed_form(self):
        """Diagonal covariances: d^2 = ||dmu||^2 + sum((sqrt(s1)-sqrt(s2))^2)."""
        mu1, mu2 = np.zeros(4), np.ones(4)
        s1 = np.diag([1.0, 2.0, 3.0, 4.0])
        s2 = np.diag([4.0, 3.0, 2.0, 1.0])
        want = 4.0 + float(np.sum((np.sqrt(np.diag(s1)) - np.sqrt(np.diag(s2))) ** 2))
        assert frechet_distance(mu1, s1, mu2, s2) == pytest.approx(want, rel=1e-6)

    def test_sample_statistics_converge(self, rng):
        """FID between two large samples of the SAME distribution ~ 0."""
        cov_root = rng.standard_normal((4, 4)) * 0.3
        def draw(n):
            return rng.standard_normal((n, 4)) @ cov_root + 1.0
        mu1, s1 = activation_statistics(draw(20000))
        mu2, s2 = activation_statistics(draw(20000))
        assert frechet_distance(mu1, s1, mu2, s2) < 0.01

    def test_singular_jitter_fallback(self):
        """Rank-deficient covariances go through the eps-jitter retry
        (reference: fid_score.py:194-200)."""
        mu = np.zeros(4)
        sigma = np.zeros((4, 4))  # totally singular
        d = frechet_distance(mu, sigma, mu + 1.0, sigma)
        assert d == pytest.approx(4.0, rel=1e-3)

    def test_stats_roundtrip(self, tmp_path, rng):
        mu, sigma = activation_statistics(rng.standard_normal((100, 8)))
        path = str(tmp_path / "stats.npz")
        save_stats(path, mu, sigma)
        mu2, sigma2 = load_stats(path)
        np.testing.assert_array_equal(mu, mu2)
        np.testing.assert_array_equal(sigma, sigma2)


class TestInception:
    @pytest.fixture(scope="class")
    def params(self):
        from rcot_tpu.metrics.inception import init_inception_params
        with pytest.warns(UserWarning, match="SURROGATE"):
            return init_inception_params(None)

    def test_pool3_shape_2048(self, params, rng):
        import jax.numpy as jnp

        from rcot_tpu.metrics.inception import inception_pool3
        x = jnp.asarray(rng.uniform(size=(2, 64, 64, 3)).astype(np.float32))
        feats = inception_pool3(params, x)
        assert feats.shape == (2, 2048)
        assert np.isfinite(np.asarray(feats)).all()

    def test_param_count_matches_inception_v3_convs(self, params):
        """Conv weights of the InceptionV3 pool3 path (BN folded into conv
        biases): 21,751,136 — block Mixed_5b verified by hand against
        torchvision's InceptionA(192, pool_features=32) layer algebra."""
        n = sum(int(np.prod(p["w"].shape)) for p in params.values())
        assert n == 21_751_136

    def test_sensitive_to_input(self, params, rng):
        import jax.numpy as jnp

        from rcot_tpu.metrics.inception import inception_pool3
        a = jnp.asarray(rng.uniform(size=(1, 64, 64, 3)).astype(np.float32))
        b = jnp.asarray(rng.uniform(size=(1, 64, 64, 3)).astype(np.float32))
        fa = np.asarray(inception_pool3(params, a))
        fb = np.asarray(inception_pool3(params, b))
        assert not np.allclose(fa, fb)
