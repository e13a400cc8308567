"""Image-quality metrics: PSNR and SSIM, device-side (jit'd) and host-side.

The reference scatters THREE PSNR variants and THREE SSIM variants across
files (SURVEY.md §5 metrics): skimage psnr/ssim, a data-dependent-peak PSNR
(evaluate.py:42-51), and a custom Gaussian-window SSIM with kernel size 2,
sigma 1, 5px border crop, on [0,255] (evaluate.py:53-73). This module is the
one canonical implementation:

- psnr: skimage.metrics.peak_signal_noise_ratio semantics (data_range given).
- ssim_ref: the reference's custom evaluate.py:53-73 math, exactly (it is the
  number tester.py prints — needed for folder-eval parity).
- ssim_skimage: skimage structural_similarity semantics (gaussian_weights
  False, 7x7 uniform window default) for paper-style numbers.

All math runs in jnp so eval batches stay on device.
"""

from __future__ import annotations

import functools as _functools

import jax
import jax.numpy as jnp
import numpy as np


def psnr(pred: jax.Array, target: jax.Array, data_range: float = 1.0) -> jax.Array:
    """skimage-parity PSNR over the whole array."""
    mse = jnp.mean(jnp.square(pred.astype(jnp.float32) - target.astype(jnp.float32)))
    return 10.0 * jnp.log10((data_range ** 2) / mse)


def psnr_peak_max(pred: jax.Array, target: jax.Array,
                  shave_border: int = 0) -> jax.Array:
    """The reference's data-dependent-peak PSNR variant (evaluate.py:42-51):
    20*log10(pred.max() / rmse) with optional border shave. Kept for parity
    with scripts that used it; prefer `psnr` for comparable numbers.
    The shave is axis-aware (H, W = the leading two of the LAST three dims),
    so batched (B,H,W,C) inputs shave the image, not the batch; identical
    images return the 100 dB cap instead of inf (an inf poisons any
    averaged metric and is invalid strict JSON)."""
    if shave_border:
        s = shave_border
        hw = pred.ndim - 3 if pred.ndim >= 3 else 0  # index of the H axis
        sl = [slice(None)] * pred.ndim
        sl[hw] = slice(s, -s)
        sl[hw + 1] = slice(s, -s)
        pred = pred[tuple(sl)]
        target = target[tuple(sl)]
    rmse = jnp.sqrt(jnp.mean(jnp.square(
        pred.astype(jnp.float32) - target.astype(jnp.float32))))
    return jnp.where(rmse == 0, jnp.float32(100.0),
                     20.0 * jnp.log10(jnp.max(pred) / rmse))


def _gaussian_kernel_cv2(ksize: int, sigma: float) -> np.ndarray:
    """cv2.getGaussianKernel parity (evaluate.py:59)."""
    if sigma <= 0:
        sigma = 0.3 * ((ksize - 1) * 0.5 - 1) + 0.8
    xs = np.arange(ksize, dtype=np.float64) - (ksize - 1) / 2
    k = np.exp(-(xs ** 2) / (2 * sigma ** 2))
    return (k / k.sum()).reshape(-1, 1)


def _filter2d_reflect101(img: jax.Array, window: np.ndarray) -> jax.Array:
    """cv2.filter2D with BORDER_REFLECT_101 (cv2 default), 2-D window.

    img: (H, W) float. cv2 anchors a kxk kernel at ((k-1)//2, (k-1)//2); for
    even k (the reference uses k=2) the pad is asymmetric: (a, k-1-a) with
    a = (k-1) - (k-1)//2 rows before, mirroring cv2's correlation alignment.
    """
    k = window.shape[0]
    anchor = (k - 1) // 2
    lo = k - 1 - anchor
    hi = anchor
    padded = jnp.pad(img, ((lo, hi), (lo, hi)), mode="reflect")
    w = jnp.asarray(window, jnp.float32)[:, :, None, None]  # HWIO
    out = jax.lax.conv_general_dilated(
        padded[None, :, :, None], w, (1, 1), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        precision=jax.lax.Precision.HIGHEST)  # metrics must be exact on TPU
    return out[0, :, :, 0]


def ssim_ref_single(img1: jax.Array, img2: jax.Array) -> jax.Array:
    """The reference's custom SSIM (evaluate.py:53-73), exactly:

    Gaussian window cv2.getGaussianKernel(2, 1) outer product; filter2D with
    default reflect-101 border; [5:-5, 5:-5] crop; C1=(0.01*255)^2,
    C2=(0.03*255)^2; inputs in [0, 255]. Multichannel inputs are filtered
    per-channel jointly (cv2.filter2D applies the 2-D window per channel).
    """
    # Rescale [0,255] -> [0,1] with C1/C2 scaled by (1/255)^2: SSIM is
    # exactly invariant under this, and it buys ~5e4x less fp32 cancellation
    # in sigma = filt(x^2) - mu^2 (at |x|~255, filt(x^2) ~ 6.5e4 where fp32
    # eps is ~0.007 — percent-level sigma error in flat regions; the
    # reference computes in float64 and never sees it).
    img1 = img1.astype(jnp.float32) / 255.0
    img2 = img2.astype(jnp.float32) / 255.0
    window = _gaussian_kernel_cv2(2, 1.0)
    window2d = np.outer(window, window)
    c1 = 0.01 ** 2
    c2 = 0.03 ** 2

    def filt(x):
        if x.ndim == 2:
            return _filter2d_reflect101(x, window2d)
        return jnp.stack([_filter2d_reflect101(x[..., c], window2d)
                          for c in range(x.shape[-1])], axis=-1)

    mu1 = filt(img1)[5:-5, 5:-5]
    mu2 = filt(img2)[5:-5, 5:-5]
    mu1_sq, mu2_sq, mu1_mu2 = mu1 ** 2, mu2 ** 2, mu1 * mu2
    sigma1_sq = filt(img1 ** 2)[5:-5, 5:-5] - mu1_sq
    sigma2_sq = filt(img2 ** 2)[5:-5, 5:-5] - mu2_sq
    sigma12 = filt(img1 * img2)[5:-5, 5:-5] - mu1_mu2
    ssim_map = ((2 * mu1_mu2 + c1) * (2 * sigma12 + c2)) / (
        (mu1_sq + mu2_sq + c1) * (sigma1_sq + sigma2_sq + c2))
    return jnp.mean(ssim_map)


def ssim_skimage_single(img1: jax.Array, img2: jax.Array,
                        data_range: float = 1.0) -> jax.Array:
    """skimage.structural_similarity defaults: 7x7 uniform window, K1=0.01,
    K2=0.03, per-channel mean for multichannel."""
    img1 = img1.astype(jnp.float32)
    img2 = img2.astype(jnp.float32)
    win = 7
    c1 = (0.01 * data_range) ** 2
    c2 = (0.03 * data_range) ** 2
    kernel = np.ones((win, win), np.float64) / (win * win)

    def filt_valid(x):
        w = jnp.asarray(kernel, jnp.float32)[:, :, None, None]
        out = jax.lax.conv_general_dilated(
            x[None, :, :, None], w, (1, 1), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            precision=jax.lax.Precision.HIGHEST)
        return out[0, :, :, 0]

    def channel_ssim(a, b):
        ux, uy = filt_valid(a), filt_valid(b)
        # skimage uses unbiased (N/(N-1)) sample moments
        np_ = win * win
        cov_norm = np_ / (np_ - 1.0)
        uxx = filt_valid(a * a)
        uyy = filt_valid(b * b)
        uxy = filt_valid(a * b)
        vx = cov_norm * (uxx - ux * ux)
        vy = cov_norm * (uyy - uy * uy)
        vxy = cov_norm * (uxy - ux * uy)
        s = ((2 * ux * uy + c1) * (2 * vxy + c2)) / (
            (ux ** 2 + uy ** 2 + c1) * (vx + vy + c2))
        return jnp.mean(s)

    if img1.ndim == 2:
        return channel_ssim(img1, img2)
    vals = [channel_ssim(img1[..., c], img2[..., c]) for c in range(img1.shape[-1])]
    return jnp.mean(jnp.stack(vals))


def compute_psnr_ssim(recovered: jax.Array, clean: jax.Array,
                      data_range: float = 1.0):
    """Batch PSNR/SSIM means (reference: util/val_utils.py:50-66 — skimage
    semantics per-sample, averaged). Inputs: (B, H, W, C) in [0, data_range].
    Returns (psnr_mean, ssim_mean, n)."""
    b = recovered.shape[0]
    ps = jnp.stack([psnr(recovered[i], clean[i], data_range) for i in range(b)])
    ss = jnp.stack([ssim_skimage_single(recovered[i], clean[i], data_range)
                    for i in range(b)])
    return jnp.mean(ps), jnp.mean(ss), b


def niqe(img, model=None, model_path: str = None) -> float:
    """No-reference NIQE (reference: util/val_utils.py:69-74 wraps
    skvideo.measure.niqe). Real implementation in metrics/niqe.py — the full
    MSCN + GGD/AGGD NSS pipeline at two scales. A pristine model is required:
    pass a fitted `model` dict (metrics.niqe.fit_niqe_model — surrogate,
    relative scores), a `model_path` (turnkey .mat/.npz official params), or
    set RCOT_NIQE_MODEL to a params file."""
    import os as _os

    from . import niqe as _niqe
    if model is None:
        path = model_path or _os.environ.get("RCOT_NIQE_MODEL")
        if not path:
            raise ValueError(
                "NIQE needs a pristine model: pass model=fit_niqe_model(...) "
                "or model_path=/RCOT_NIQE_MODEL= a niqe params .mat/.npz "
                "(the official niqe_image_params.mat is download-time data "
                "unavailable in-sandbox — STATUS weights-sweep entries)")
        model = _load_niqe_model_cached(path)
    return _niqe.niqe(np.asarray(img), model)


@_functools.lru_cache(maxsize=4)
def _load_niqe_model_cached(path: str):
    # per-image facade calls with RCOT_NIQE_MODEL set must not re-read and
    # re-parse the params file N times for an N-image eval
    from . import niqe as _niqe
    return _niqe.load_niqe_model(path)


class Timer:
    """Cumulative wall-clock timer (reference: util/val_utils.py:76-97)."""

    def __init__(self):
        import time as _time
        self._time = _time
        self.acc = 0.0
        self.t0 = _time.time()

    def tic(self) -> None:
        self.t0 = self._time.time()

    def toc(self, restart: bool = False) -> float:
        diff = self._time.time() - self.t0
        if restart:
            self.t0 = self._time.time()
        return diff

    def hold(self) -> None:
        self.acc += self.toc()

    def release(self) -> float:
        ret = self.acc
        self.acc = 0.0
        return ret


class AverageMeter:
    """Running mean tracker (reference: util/val_utils.py:8-26)."""

    def __init__(self):
        self.sum = 0.0
        self.count = 0

    def update(self, value: float, n: int = 1) -> None:
        self.sum += float(value) * n
        self.count += n

    @property
    def avg(self) -> float:
        return self.sum / self.count if self.count else float("nan")
