"""Port lpips-'alex' weights to the npz rcot_tpu/metrics/lpips.py loads.

Run OFFLINE in an environment with the `lpips` package (and network for its
weight download — this sandbox has neither):

    python tools/port_lpips.py lpips_alex.npz

Mapping (see metrics/lpips.py ALEX_SPECS):
- lpips.LPIPS(net='alex').net.slice*/features convs -> conv1..conv5:
  torch OIHW -> HWIO transpose, bias as-is;
- .lins[i].model[1].weight (1x1 conv, shape (1, C, 1, 1)) -> lin{i}.w (C,).
"""

import sys

import numpy as np


def main(out_path: str) -> None:
    import lpips as lpips_pkg  # noqa: F401 (offline dependency)
    import torch

    net = lpips_pkg.LPIPS(net="alex", spatial=False)
    alex = net.net  # lpips.pretrained_networks.alexnet wrapper
    convs = [m for m in alex.modules()
             if isinstance(m, torch.nn.Conv2d)]
    assert len(convs) == 5, len(convs)
    payload = {}
    for i, conv in enumerate(convs):
        w = conv.weight.detach().numpy()  # OIHW
        payload[f"conv{i + 1}.w"] = np.transpose(w, (2, 3, 1, 0))
        payload[f"conv{i + 1}.b"] = conv.bias.detach().numpy()
    for i, lin in enumerate(net.lins):
        w = lin.model[1].weight.detach().numpy()  # (1, C, 1, 1)
        payload[f"lin{i}.w"] = w.reshape(-1)
    np.savez_compressed(out_path, **payload)
    print(f"wrote {out_path}: {sorted(payload)}")


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "lpips_alex.npz")
