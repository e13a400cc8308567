"""LPIPS tests: torch-twin forward parity on shared surrogate weights,
plus metric sanity (zero at identity, monotone in distortion).

The reference ships lpips in its env and imports it but comments out the
calls (reference: evaluate.py:78,95-96; env.yml:40) — real lpips weights are
unobtainable here (zero egress), so like FID (tests/test_fid_torch_parity.py)
the evidence is an independent PyTorch twin + ordering properties.
"""

import numpy as np
import pytest

from rcot_tpu.metrics.lpips import (ALEX_SPECS, LIN_CHANNELS,
                                    init_lpips_params, lpips)


def _params():
    import warnings
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        return init_lpips_params(None)


def test_identity_is_zero_and_monotone():
    import jax.numpy as jnp
    params = _params()
    rng = np.random.default_rng(0)
    x = rng.uniform(0, 1, (2, 64, 64, 3)).astype(np.float32)
    d0 = np.asarray(lpips(params, jnp.asarray(x), jnp.asarray(x)))
    assert np.allclose(d0, 0.0, atol=1e-6)
    prev = 0.0
    for sigma in (0.02, 0.08, 0.25):
        y = np.clip(x + rng.normal(0, sigma, x.shape), 0, 1).astype(np.float32)
        d = float(np.asarray(lpips(params, jnp.asarray(x),
                                   jnp.asarray(y))).mean())
        assert d > prev
        prev = d


@pytest.mark.slow
def test_matches_torch_twin():
    torch = pytest.importorskip("torch")
    import torch.nn.functional as F

    import jax.numpy as jnp

    params = _params()

    def tw(name):
        w = np.transpose(np.asarray(params[name]["w"]), (3, 2, 0, 1)).copy()
        return torch.from_numpy(w), torch.from_numpy(
            np.asarray(params[name]["b"]))

    @torch.no_grad()
    def torch_lpips(x01, y01):
        shift = torch.tensor([-0.030, -0.088, -0.188]).view(1, 3, 1, 1)
        scale = torch.tensor([0.458, 0.448, 0.450]).view(1, 3, 1, 1)

        def feats(v):
            v = (2 * v - 1 - shift) / scale
            out = []
            for i, (name, _ci, _co, _k, s, p) in enumerate(ALEX_SPECS):
                w, b = tw(name)
                v = F.relu(F.conv2d(v, w, b, stride=s, padding=p))
                out.append(v)
                if i < 2:
                    v = F.max_pool2d(v, 3, 2)
            return out

        fx, fy = feats(x01), feats(y01)
        total = 0.0
        for i, (a, b) in enumerate(zip(fx, fy)):
            na = a / (a.pow(2).sum(1, keepdim=True).sqrt() + 1e-10)
            nb = b / (b.pow(2).sum(1, keepdim=True).sqrt() + 1e-10)
            d = (na - nb).pow(2)
            w = torch.from_numpy(np.asarray(params[f"lin{i}"])).view(
                1, LIN_CHANNELS[i], 1, 1)
            total = total + (d * w).sum(1).mean(dim=(1, 2))
        return total.numpy()

    rng = np.random.default_rng(1)
    x = rng.uniform(0, 1, (2, 64, 64, 3)).astype(np.float32)
    y = np.clip(x + rng.normal(0, 0.1, x.shape), 0, 1).astype(np.float32)
    ours = np.asarray(lpips(params, jnp.asarray(x), jnp.asarray(y)))
    theirs = torch_lpips(torch.from_numpy(x.transpose(0, 3, 1, 2)),
                         torch.from_numpy(y.transpose(0, 3, 1, 2)))
    np.testing.assert_allclose(ours, theirs, rtol=1e-4, atol=1e-6)
