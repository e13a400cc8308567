"""Turnkey weights-port schema tests (SURVEY.md §6 FID parity prerequisite).

Real InceptionV3 / LPIPS weights are unobtainable in this sandbox (zero
egress; reference loads them via pytorch_fid / the lpips package —
fid_score.py:93-155, env.yml:40,56-59). These tests make the port TURNKEY
for the day a weights file appears: they synthesize a state_dict / payload
in the EXACT format the offline port tools consume/emit, drive the real
port code (tools/port_inception.py fold_state_dict) and the real load paths
(init_inception_params / init_lpips_params) through fold-BN -> npz ->
load -> features, and pin the BN-folding algebra — so loading a real file
is plug-and-play rather than a debugging session.
"""

from __future__ import annotations

import importlib.util
import os
import warnings

import numpy as np
import pytest

import jax
import jax.numpy as jnp

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _load_tool(name: str):
    spec = importlib.util.spec_from_file_location(
        name, os.path.join(ROOT, "tools", f"{name}.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _synth_inception_state_dict():
    """A state_dict with torchvision's exact key naming and OIHW/BN shapes
    for every BasicConv2d of the pool3 path, with NONZERO bn stats so the
    folding algebra is actually exercised (zero mean / unit var would make
    folding a near-no-op and hide transpose or eps bugs)."""
    from rcot_tpu.metrics.inception import conv_specs

    sd = {}
    for name, cin, cout, (kh, kw), _s, _p in conv_specs():
        rng = np.random.default_rng(
            np.frombuffer(name.encode().ljust(8, b"x")[:8], np.uint32))
        sd[f"{name}.conv.weight"] = rng.standard_normal(
            (cout, cin, kh, kw)).astype(np.float32) * 0.05
        sd[f"{name}.bn.weight"] = rng.uniform(0.5, 1.5, cout).astype(np.float32)
        sd[f"{name}.bn.bias"] = rng.standard_normal(cout).astype(np.float32) * 0.1
        sd[f"{name}.bn.running_mean"] = rng.standard_normal(cout).astype(
            np.float32) * 0.2
        sd[f"{name}.bn.running_var"] = rng.uniform(0.2, 2.0, cout).astype(
            np.float32)
    return sd


class TestInceptionPort:
    def test_fold_load_features_end_to_end(self, tmp_path):
        """state_dict -> fold_state_dict (the real port tool) -> npz ->
        init_inception_params -> pool3 features, warning-free."""
        port = _load_tool("port_inception")
        from rcot_tpu.metrics.inception import (init_inception_params,
                                                inception_pool3)

        sd = _synth_inception_state_dict()
        folded = port.fold_state_dict(sd)
        path = str(tmp_path / "inception.npz")
        np.savez_compressed(path, **folded)

        with warnings.catch_warnings():
            warnings.simplefilter("error")  # surrogate fallback would warn
            params = init_inception_params(path)

        x = jnp.asarray(np.random.default_rng(0).uniform(
            0, 1, (2, 64, 64, 3)).astype(np.float32))
        feats = inception_pool3(params, x)
        assert feats.shape == (2, 2048)
        assert bool(jnp.all(jnp.isfinite(feats)))

        # the file must actually be USED: surrogate features must differ
        with warnings.catch_warnings():
            warnings.simplefilter("ignore")
            surrogate = init_inception_params(None)
        feats_sur = inception_pool3(surrogate, x)
        assert float(jnp.abs(feats - feats_sur).max()) > 1e-3

    def test_bn_folding_algebra(self):
        """conv(x, w') + b' == BN(conv(x, w)) with torchvision's eps=1e-3,
        pinned on the stem conv — catches transpose/eps/scale mistakes."""
        port = _load_tool("port_inception")
        from rcot_tpu.metrics.inception import conv_specs

        name, cin, cout, (kh, kw), (sh, sw), (ph, pw) = conv_specs()[0]
        full = _synth_inception_state_dict()
        folded = port.fold_state_dict(full)

        x = np.random.default_rng(1).standard_normal(
            (2, 17, 17, cin)).astype(np.float32)
        w_oihw = full[f"{name}.conv.weight"]
        w_hwio = np.transpose(w_oihw, (2, 3, 1, 0))
        y = jax.lax.conv_general_dilated(
            jnp.asarray(x), jnp.asarray(w_hwio), (sh, sw),
            [(ph, ph), (pw, pw)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        gamma = full[f"{name}.bn.weight"]
        beta = full[f"{name}.bn.bias"]
        mean = full[f"{name}.bn.running_mean"]
        var = full[f"{name}.bn.running_var"]
        y_bn = (np.asarray(y) - mean) / np.sqrt(var + port.BN_EPS) * gamma + beta

        y_fold = jax.lax.conv_general_dilated(
            jnp.asarray(x), jnp.asarray(folded[name + ".w"]), (sh, sw),
            [(ph, ph), (pw, pw)],
            dimension_numbers=("NHWC", "HWIO", "NHWC")) + folded[name + ".b"]
        np.testing.assert_allclose(np.asarray(y_fold), y_bn,
                                   rtol=2e-5, atol=2e-5)

    def test_fid_cli_consumes_weights_file(self, tmp_path):
        """The full user path: rcot-fid --inception-weights <npz> computes a
        finite FID between two tiny folders using the ported file."""
        from PIL import Image
        port = _load_tool("port_inception")
        from rcot_tpu.cli.fid import compute_fid_folders

        folded = port.fold_state_dict(_synth_inception_state_dict())
        wpath = str(tmp_path / "inception.npz")
        np.savez_compressed(wpath, **folded)

        rng = np.random.default_rng(2)
        for sub in ("a", "b"):
            os.makedirs(tmp_path / sub)
            for i in range(3):
                Image.fromarray(rng.integers(
                    0, 255, (40, 40, 3), dtype=np.uint8)).save(
                        tmp_path / sub / f"{i}.png")
        fid = compute_fid_folders(str(tmp_path / "a"), str(tmp_path / "b"),
                                  batch_size=3, weights=wpath)
        assert np.isfinite(fid) and fid >= 0


class TestLpipsPort:
    def test_payload_schema_load_and_score(self, tmp_path):
        """An npz in tools/port_lpips.py's exact output schema loads
        warning-free and scores an image pair: finite, >=0, zero for
        identical inputs, and actually uses the file (differs from the
        surrogate's score)."""
        from rcot_tpu.metrics.lpips import (ALEX_SPECS, LIN_CHANNELS,
                                            init_lpips_params, lpips)

        payload = {}
        for name, cin, cout, k, _s, _p in ALEX_SPECS:
            rng = np.random.default_rng(
                np.frombuffer(name.encode().ljust(8, b"y")[:8], np.uint32))
            payload[f"{name}.w"] = rng.standard_normal(
                (k, k, cin, cout)).astype(np.float32) * 0.05
            payload[f"{name}.b"] = rng.standard_normal(cout).astype(
                np.float32) * 0.1
        for i, c in enumerate(LIN_CHANNELS):
            rng = np.random.default_rng(1000 + i)
            payload[f"lin{i}.w"] = rng.uniform(0, 1, c).astype(np.float32)
        path = str(tmp_path / "lpips_alex.npz")
        np.savez_compressed(path, **payload)

        with warnings.catch_warnings():
            warnings.simplefilter("error")
            params = init_lpips_params(path)

        rng = np.random.default_rng(3)
        x = jnp.asarray(rng.uniform(0, 1, (1, 64, 64, 3)).astype(np.float32))
        y = jnp.asarray(rng.uniform(0, 1, (1, 64, 64, 3)).astype(np.float32))
        d = float(lpips(params, x, y)[0])   # (B,) per-pair distances
        assert np.isfinite(d) and d >= 0
        assert float(lpips(params, x, x)[0]) == pytest.approx(0.0, abs=1e-6)

        with warnings.catch_warnings():
            warnings.simplefilter("ignore")
            surrogate = init_lpips_params(None)
        assert float(lpips(surrogate, x, y)[0]) != pytest.approx(d)
