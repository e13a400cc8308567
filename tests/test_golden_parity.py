"""End-to-end functional parity vs the reference PyTorch model.

Goldens in tests/goldens/ were captured by tools/make_goldens.py: the actual
reference Net_Restormer.py forward ran on torch CPU with every parameter
overwritten by a value derived deterministically from its state_dict name.
Here we regenerate the identical state_dict numerically (no torch, no
reference code), port it through compat/torch_port.py, and require the full
two-pass forward to match the captured output. This pins the ENTIRE model
math (layout, channel ordering, LN/MDTA/GDFN semantics, two-pass wiring) and
the checkpoint porter in one test.
"""

import os
import zlib

import jax.numpy as jnp
import numpy as np
import pytest

from rcot_tpu.compat.torch_port import port_fnet_state_dict, port_tnet_state_dict
from rcot_tpu.models.critic import apply_fnet
from rcot_tpu.models.restormer import apply_tnet, count_params
from rcot_tpu.utils.config import CriticConfig, ModelConfig

GOLDENS = os.path.join(os.path.dirname(__file__), "goldens")


def synth_param(name: str, shape) -> np.ndarray:
    """Must stay in sync with tools/make_goldens.py."""
    seed = zlib.crc32(name.encode()) & 0xFFFFFFFF
    rng = np.random.default_rng(seed)
    return (rng.standard_normal(shape) * 0.02).astype(np.float32)


def rebuild_state_dict(z):
    names = [str(n) for n in z["names"]]
    shapes = [tuple(int(v) for v in s.split(",")) for s in z["shapes"]]
    return {n: synth_param(n, s) for n, s in zip(names, shapes)}


@pytest.fixture(scope="module")
def tnet_golden():
    path = os.path.join(GOLDENS, "tnet_full.npz")
    if not os.path.exists(path):
        pytest.skip("tnet golden not generated")
    return np.load(path)


@pytest.fixture(scope="module")
def fnet_golden():
    path = os.path.join(GOLDENS, "fnet_p64.npz")
    if not os.path.exists(path):
        pytest.skip("fnet golden not generated")
    return np.load(path)


class TestTnetGolden:
    @pytest.mark.slow
    def test_two_pass_forward_matches_reference(self, tnet_golden):
        cfg = ModelConfig()
        sd = rebuild_state_dict(tnet_golden)
        params = port_tnet_state_dict(sd, cfg)
        assert count_params(params) == 46_853_150

        x = np.transpose(tnet_golden["input"], (0, 2, 3, 1))  # NCHW -> NHWC
        out2, _, _ = apply_tnet(params, jnp.asarray(x), cfg)
        got = np.transpose(np.asarray(out2), (0, 3, 1, 2))
        want = tnet_golden["out2"]
        np.testing.assert_allclose(got, want, atol=2e-4, rtol=1e-3)


class TestFnetGolden:
    def test_critic_matches_reference(self, fnet_golden):
        cfg = CriticConfig(patch_size=64)
        sd = rebuild_state_dict(fnet_golden)
        params = port_fnet_state_dict(sd, cfg)
        x = np.transpose(fnet_golden["input"], (0, 2, 3, 1))
        got = np.asarray(apply_fnet(params, jnp.asarray(x), cfg))
        np.testing.assert_allclose(got, fnet_golden["score"], atol=1e-5,
                                   rtol=1e-4)


@pytest.fixture(scope="module")
def mprnet_golden():
    path = os.path.join(GOLDENS, "mprnet_tnet.npz")
    if not os.path.exists(path):
        pytest.skip("mprnet golden not generated")
    return np.load(path)


class TestMprnetGolden:
    def test_legacy_two_pass_matches_reference(self, mprnet_golden):
        from rcot_tpu.compat.torch_port import port_mprnet_state_dict
        from rcot_tpu.models.mprnet import apply_mprnet_tnet

        sd = rebuild_state_dict(mprnet_golden)
        params = port_mprnet_state_dict(sd)
        assert count_params(params) == 6_842_689
        x = np.transpose(mprnet_golden["input"], (0, 2, 3, 1))
        out2, _, _ = apply_mprnet_tnet(params, jnp.asarray(x))
        got = np.transpose(np.asarray(out2), (0, 3, 1, 2))
        np.testing.assert_allclose(got, mprnet_golden["out"], atol=2e-4,
                                   rtol=1e-3)
