"""Frechet distance + activation statistics (FID core math).

Behavioral spec (reference: fid_score.py:158-252, vendored pytorch-fid):
- d^2 = ||mu1 - mu2||^2 + Tr(C1 + C2 - 2 sqrt(C1 C2))
- scipy sqrtm on the covariance product with the eps-jitter retry when the
  product is near-singular (fid_score.py:194-200) and the imaginary-component
  tolerance check (fid_score.py:203-207);
- activation statistics: mean + covariance (rowvar=False) over features.

The heavy part (feature extraction) is jit'd JAX (metrics/inception.py);
the O(dims^3) sqrtm stays on host scipy like the reference.
"""

from __future__ import annotations

from typing import Tuple

import numpy as np
from scipy import linalg


def frechet_distance(mu1: np.ndarray, sigma1: np.ndarray,
                     mu2: np.ndarray, sigma2: np.ndarray,
                     eps: float = 1e-6) -> float:
    mu1 = np.atleast_1d(np.asarray(mu1, np.float64))
    mu2 = np.atleast_1d(np.asarray(mu2, np.float64))
    sigma1 = np.atleast_2d(np.asarray(sigma1, np.float64))
    sigma2 = np.atleast_2d(np.asarray(sigma2, np.float64))
    if mu1.shape != mu2.shape or sigma1.shape != sigma2.shape:
        raise ValueError("statistics shape mismatch")

    diff = mu1 - mu2
    covmean, _ = linalg.sqrtm(sigma1 @ sigma2, disp=False)
    if not np.isfinite(covmean).all():
        # near-singular product: jitter the diagonals and retry
        offset = np.eye(sigma1.shape[0]) * eps
        covmean = linalg.sqrtm((sigma1 + offset) @ (sigma2 + offset))
    if np.iscomplexobj(covmean):
        if not np.allclose(np.diagonal(covmean).imag, 0, atol=1e-3):
            raise ValueError(
                f"imaginary component {np.max(np.abs(covmean.imag))}")
        covmean = covmean.real
    return float(diff @ diff + np.trace(sigma1) + np.trace(sigma2)
                 - 2.0 * np.trace(covmean))


def activation_statistics(feats: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """(N, D) features -> (mu, sigma) with sample covariance (rowvar=False)."""
    feats = np.asarray(feats, np.float64)
    mu = feats.mean(axis=0)
    sigma = np.cov(feats, rowvar=False)
    return mu, sigma


def save_stats(path: str, mu: np.ndarray, sigma: np.ndarray) -> None:
    np.savez_compressed(path, mu=mu, sigma=sigma)


def load_stats(path: str) -> Tuple[np.ndarray, np.ndarray]:
    with np.load(path) as z:
        return z["mu"], z["sigma"]
