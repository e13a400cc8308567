"""Capture golden outputs from the reference PyTorch model (CPU).

Run once in an environment where /root/reference is mounted. The trick that
keeps goldens small: instead of storing 46.8M weights, every parameter is
OVERWRITTEN with a value derived deterministically from its state_dict name
(seeded per-name RNG). Tests regenerate the same state_dict numerically from
the stored (name, shape) list — no torch model, no reference code — port it
through compat/torch_port.py, and compare forwards.

Goldens (committed to tests/goldens/):
- tnet_full.npz: full dim=48 two-pass T_net forward on a 32x32 input.
- fnet_p64.npz:  F_net at patch 64 on a 64x64 input.

Usage: python tools/make_goldens.py
"""

import os
import sys
import types

import numpy as np

REF = "/root/reference"
OUT = os.path.join(os.path.dirname(__file__), "..", "tests", "goldens")


def _stub_torchvision():
    """The reference imports torchvision.utils.save_image (not installed and
    not needed for forward math) — stub it before import."""
    tv = types.ModuleType("torchvision")
    utils = types.ModuleType("torchvision.utils")
    utils.save_image = lambda *a, **k: None
    tv.utils = utils
    sys.modules.setdefault("torchvision", tv)
    sys.modules.setdefault("torchvision.utils", utils)


def name_seed(name: str) -> int:
    """Stable 32-bit seed from a parameter name (shared with tests)."""
    import zlib
    return zlib.crc32(name.encode()) & 0xFFFFFFFF


def synth_param(name: str, shape) -> np.ndarray:
    """Deterministic small weights: N(0, 0.02) from a per-name RNG
    (shared with tests — keep in sync with tests/test_golden_parity.py)."""
    rng = np.random.default_rng(name_seed(name))
    return (rng.standard_normal(shape) * 0.02).astype(np.float32)


def overwrite_params(module) -> list:
    import torch
    names_shapes = []
    sd = module.state_dict()
    new_sd = {}
    for name, tensor in sd.items():
        arr = synth_param(name, tuple(tensor.shape))
        new_sd[name] = torch.from_numpy(arr)
        names_shapes.append((name, tuple(tensor.shape)))
    module.load_state_dict(new_sd)
    return names_shapes


def main():
    _stub_torchvision()
    sys.path.insert(0, REF)
    os.makedirs(OUT, exist_ok=True)
    import torch

    import Net_Restormer as ref  # noqa: E402 (reference module)

    torch.manual_seed(0)
    with torch.no_grad():
        # --- T_net golden (full config, two-pass) ---
        tnet = ref.T_net(decoder=True).eval()
        names_shapes = overwrite_params(tnet)
        rng = np.random.default_rng(1234)
        x = rng.uniform(0, 1, (1, 3, 32, 32)).astype(np.float32)
        out2 = tnet(torch.from_numpy(x)).numpy()
        np.savez_compressed(
            os.path.join(OUT, "tnet_full.npz"),
            input=x, out2=out2,
            names=np.array([n for n, _ in names_shapes]),
            shapes=np.array([",".join(map(str, s)) for _, s in names_shapes]),
        )
        print("tnet golden:", out2.shape, float(np.abs(out2).mean()))

        # --- F_net golden (patch 64) ---
        fnet = ref.F_net(patch_size=64).eval()
        fns = overwrite_params(fnet)
        xf = rng.uniform(0, 1, (2, 3, 64, 64)).astype(np.float32)
        score = fnet(torch.from_numpy(xf)).numpy()
        np.savez_compressed(
            os.path.join(OUT, "fnet_p64.npz"),
            input=xf, score=score,
            names=np.array([n for n, _ in fns]),
            shapes=np.array([",".join(map(str, s)) for _, s in fns]),
        )
        print("fnet golden:", score.shape, score)

        # --- legacy MPRNet T_net golden ---
        import Net as legacy
        lt = legacy.T_net().eval()
        lns = overwrite_params(lt)
        xl = rng.uniform(0, 1, (1, 3, 32, 32)).astype(np.float32)
        out_l = lt(torch.from_numpy(xl)).numpy()
        np.savez_compressed(
            os.path.join(OUT, "mprnet_tnet.npz"),
            input=xl, out=out_l,
            names=np.array([n for n, _ in lns]),
            shapes=np.array([",".join(map(str, s)) for _, s in lns]),
        )
        print("legacy golden:", out_l.shape, float(np.abs(out_l).mean()))


if __name__ == "__main__":
    main()
