"""FID evidence without downloadable weights (VERDICT round-1 item #3).

Real InceptionV3 weights are unobtainable in this sandbox (zero egress; no
torchvision/pytorch_fid/keras caches — checked), so the FID net runs on a
deterministic surrogate init. These tests make that surrogate trustworthy:

1. torch-twin activation parity: an INDEPENDENT PyTorch implementation of the
   FID-variant InceptionV3 forward (pytorch_fid semantics: bilinear-299
   resize, [-1,1] scaling, count_include_pad=False avg pools, max-pool branch
   in Mixed_7c) is built from the same conv spec table and the same surrogate
   weights; JAX pool3 features must match it. This cross-checks every
   semantic the JAX port could get wrong (resize rules, pool variants,
   padding, concat order) — exactly what weight-porting would exercise.
2. Frechet pipeline parity: full folder->FID through our pipeline vs a
   torch-side activations + an inline independent Frechet formula.
3. Rank order: sets degraded with increasing noise must score monotonically
   increasing FID against the clean set (the property FID is used for in
   tester.py:116-119) — so surrogate-FID ordering is meaningful even though
   its absolute values are not comparable to published numbers.
"""

from __future__ import annotations

import os

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402

pytestmark = pytest.mark.slow


# ------------------------------------------------------------ torch twin

def _torch_params():
    """The SAME surrogate weights the JAX net falls back to, as torch tensors
    in OIHW."""
    import warnings

    from rcot_tpu.metrics.inception import init_inception_params
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        params = init_inception_params(None)
    out = {}
    for name, p in params.items():
        w = np.transpose(np.asarray(p["w"]), (3, 2, 0, 1)).copy()
        out[name] = (torch.from_numpy(w), torch.from_numpy(np.asarray(p["b"])))
    return out


class TorchFIDInception:
    """Hand-rolled pytorch_fid-semantics InceptionV3 pool3 forward."""

    def __init__(self):
        from rcot_tpu.metrics.inception import conv_specs
        self.p = _torch_params()
        self.spec = {s[0]: s for s in conv_specs()}

    def conv(self, name, x):
        _, _, _, _, (sh, sw), (ph, pw) = self.spec[name]
        w, b = self.p[name]
        y = F.conv2d(x, w, b, stride=(sh, sw), padding=(ph, pw))
        return F.relu(y)

    def avg3(self, x):
        return F.avg_pool2d(x, 3, stride=1, padding=1,
                            count_include_pad=False)

    def block_a(self, prefix, x):
        b1 = self.conv(f"{prefix}.branch1x1", x)
        b5 = self.conv(f"{prefix}.branch5x5_2",
                       self.conv(f"{prefix}.branch5x5_1", x))
        b3 = self.conv(f"{prefix}.branch3x3dbl_1", x)
        b3 = self.conv(f"{prefix}.branch3x3dbl_2", b3)
        b3 = self.conv(f"{prefix}.branch3x3dbl_3", b3)
        bp = self.conv(f"{prefix}.branch_pool", self.avg3(x))
        return torch.cat([b1, b5, b3, bp], 1)

    def block_b(self, prefix, x):
        b3 = self.conv(f"{prefix}.branch3x3", x)
        bd = self.conv(f"{prefix}.branch3x3dbl_1", x)
        bd = self.conv(f"{prefix}.branch3x3dbl_2", bd)
        bd = self.conv(f"{prefix}.branch3x3dbl_3", bd)
        return torch.cat([b3, bd, F.max_pool2d(x, 3, 2)], 1)

    def block_c(self, prefix, x):
        b1 = self.conv(f"{prefix}.branch1x1", x)
        b7 = self.conv(f"{prefix}.branch7x7_1", x)
        b7 = self.conv(f"{prefix}.branch7x7_2", b7)
        b7 = self.conv(f"{prefix}.branch7x7_3", b7)
        bd = self.conv(f"{prefix}.branch7x7dbl_1", x)
        for i in (2, 3, 4, 5):
            bd = self.conv(f"{prefix}.branch7x7dbl_{i}", bd)
        bp = self.conv(f"{prefix}.branch_pool", self.avg3(x))
        return torch.cat([b1, b7, bd, bp], 1)

    def block_d(self, prefix, x):
        b3 = self.conv(f"{prefix}.branch3x3_2",
                       self.conv(f"{prefix}.branch3x3_1", x))
        b7 = self.conv(f"{prefix}.branch7x7x3_1", x)
        for i in (2, 3, 4):
            b7 = self.conv(f"{prefix}.branch7x7x3_{i}", b7)
        return torch.cat([b3, b7, F.max_pool2d(x, 3, 2)], 1)

    def block_e(self, prefix, x, max_pool_branch):
        b1 = self.conv(f"{prefix}.branch1x1", x)
        b3 = self.conv(f"{prefix}.branch3x3_1", x)
        b3 = torch.cat([self.conv(f"{prefix}.branch3x3_2a", b3),
                        self.conv(f"{prefix}.branch3x3_2b", b3)], 1)
        bd = self.conv(f"{prefix}.branch3x3dbl_1", x)
        bd = self.conv(f"{prefix}.branch3x3dbl_2", bd)
        bd = torch.cat([self.conv(f"{prefix}.branch3x3dbl_3a", bd),
                        self.conv(f"{prefix}.branch3x3dbl_3b", bd)], 1)
        pooled = (F.max_pool2d(x, 3, 1, 1) if max_pool_branch
                  else self.avg3(x))
        bp = self.conv(f"{prefix}.branch_pool", pooled)
        return torch.cat([b1, b3, bd, bp], 1)

    @torch.no_grad()
    def pool3(self, x01_nchw):
        x = F.interpolate(x01_nchw, size=(299, 299), mode="bilinear",
                          align_corners=False)
        x = 2 * x - 1
        x = self.conv("Conv2d_1a_3x3", x)
        x = self.conv("Conv2d_2a_3x3", x)
        x = self.conv("Conv2d_2b_3x3", x)
        x = F.max_pool2d(x, 3, 2)
        x = self.conv("Conv2d_3b_1x1", x)
        x = self.conv("Conv2d_4a_3x3", x)
        x = F.max_pool2d(x, 3, 2)
        x = self.block_a("Mixed_5b", x)
        x = self.block_a("Mixed_5c", x)
        x = self.block_a("Mixed_5d", x)
        x = self.block_b("Mixed_6a", x)
        for m in ("Mixed_6b", "Mixed_6c", "Mixed_6d", "Mixed_6e"):
            x = self.block_c(m, x)
        x = self.block_d("Mixed_7a", x)
        x = self.block_e("Mixed_7b", x, max_pool_branch=False)
        x = self.block_e("Mixed_7c", x, max_pool_branch=True)
        return x.mean(dim=(2, 3)).numpy()


def _jax_pool3(x01_nhwc):
    import warnings

    import jax
    import jax.numpy as jnp

    from rcot_tpu.metrics.inception import (inception_pool3,
                                            init_inception_params)
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        params = init_inception_params(None)
    return np.asarray(jax.jit(
        lambda v: inception_pool3(params, v))(jnp.asarray(x01_nhwc)))


def test_pool3_activations_match_torch_twin():
    rng = np.random.default_rng(0)
    x = rng.uniform(0, 1, (2, 64, 64, 3)).astype(np.float32)
    ours = _jax_pool3(x)
    theirs = TorchFIDInception().pool3(
        torch.from_numpy(x.transpose(0, 3, 1, 2)))
    assert ours.shape == theirs.shape == (2, 2048)
    # 94 fp32 convs deep; features are O(1e-2..1e1)
    np.testing.assert_allclose(ours, theirs, rtol=2e-3, atol=2e-4)


@pytest.mark.slow
def test_pool3_matches_torch_twin_on_downscale_inputs():
    """Inputs LARGER than 299px exercise the resize's DOWNSCALE path, where
    jax.image.resize's default antialias diverges from torch F.interpolate
    (measured max pixel diff 0.57 on [0,1] inputs) — the 64px case above
    only upscales and cannot catch an antialias regression."""
    rng = np.random.default_rng(1)
    x = rng.uniform(0, 1, (1, 320, 320, 3)).astype(np.float32)
    ours = _jax_pool3(x)
    theirs = TorchFIDInception().pool3(
        torch.from_numpy(x.transpose(0, 3, 1, 2)))
    np.testing.assert_allclose(ours, theirs, rtol=2e-3, atol=2e-4)


def _write_folder(tmpdir, name, imgs):
    from PIL import Image
    d = os.path.join(tmpdir, name)
    os.makedirs(d, exist_ok=True)
    for i, im in enumerate(imgs):
        arr = np.clip(im * 255.0 + 0.5, 0, 255).astype(np.uint8)
        Image.fromarray(arr).save(os.path.join(d, f"{i:03d}.png"))
    return d


def _frechet_torch(a, b):
    """Independent Frechet formula (published math, Dowson & Landau 1982)."""
    from scipy import linalg
    mu1, mu2 = a.mean(0), b.mean(0)
    c1 = np.cov(a, rowvar=False)
    c2 = np.cov(b, rowvar=False)
    eps = np.eye(c1.shape[0]) * 1e-6
    s, _ = linalg.sqrtm((c1 + eps) @ (c2 + eps), disp=False)
    if np.iscomplexobj(s):
        s = s.real
    d = mu1 - mu2
    return float(d @ d + np.trace(c1) + np.trace(c2) - 2 * np.trace(s))


def test_fid_pipeline_matches_torch_side(tmp_path):
    rng = np.random.default_rng(1)
    base = rng.uniform(0.2, 0.8, (6, 64, 64, 3)).astype(np.float32)
    noisy = np.clip(base + rng.normal(0, 0.15, base.shape), 0, 1).astype(
        np.float32)
    d1 = _write_folder(str(tmp_path), "clean", base)
    d2 = _write_folder(str(tmp_path), "noisy", noisy)

    from rcot_tpu.cli.fid import _load_and_preprocess, compute_fid_folders
    ours = compute_fid_folders(d1, d2, batch_size=6)

    # torch side: same PIL preprocessing, torch-twin activations, independent
    # Frechet formula
    twin = TorchFIDInception()

    def acts(d):
        files = sorted(os.path.join(d, f) for f in os.listdir(d))
        batch = np.stack([_load_and_preprocess(f) for f in files])
        return twin.pool3(torch.from_numpy(batch.transpose(0, 3, 1, 2)))

    theirs = _frechet_torch(acts(d1), acts(d2))
    assert ours == pytest.approx(theirs, rel=2e-2, abs=1e-3)


def test_fid_rank_order_monotone_in_noise():
    """Surrogate-FID must order degradation severity correctly even though
    its absolute values aren't comparable to published numbers."""
    import jax.numpy as jnp

    from rcot_tpu.metrics.frechet import (activation_statistics,
                                          frechet_distance)

    rng = np.random.default_rng(2)
    n = 12
    clean = rng.uniform(0.15, 0.85, (n, 96, 96, 3)).astype(np.float32)
    feats_clean = _jax_pool3(clean)
    mu0, s0 = activation_statistics(feats_clean)

    fids = []
    for sigma in (0.05, 0.15, 0.35):
        noisy = np.clip(clean + rng.normal(0, sigma, clean.shape), 0, 1
                        ).astype(np.float32)
        mu, s = activation_statistics(_jax_pool3(noisy))
        fids.append(frechet_distance(mu0, s0, mu, s))
    assert fids[0] < fids[1] < fids[2], fids
    assert fids[0] > 0
