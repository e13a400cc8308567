"""Port torchvision/pytorch-fid InceptionV3 weights to the JAX FID net.

Run OFFLINE in an environment with torchvision + downloaded weights (this
sandbox has neither). Folds each BasicConv2d's BatchNorm into the conv:

    w' = w * gamma / sqrt(var + eps)        (per output channel)
    b' = beta - gamma * mean / sqrt(var + eps)

and transposes OIHW -> HWIO, writing the npz that
rcot_tpu.metrics.inception.init_inception_params loads. Prefer the
pytorch-fid weights (pt_inception-2015-12-05) for published-FID parity; plain
torchvision inception_v3 weights also work (slightly different FID scale).

Usage:
  python tools/port_inception.py <state_dict.pth or 'torchvision'> out.npz
"""

import sys

import numpy as np

BN_EPS = 1e-3


def fold_state_dict(sd) -> dict:
    sys.path.insert(0, ".")
    from rcot_tpu.metrics.inception import conv_specs

    def np_(t):
        return t.detach().cpu().numpy() if hasattr(t, "detach") else np.asarray(t)

    out = {}
    for name, cin, cout, (kh, kw), _s, _p in conv_specs():
        w = np_(sd[f"{name}.conv.weight"])            # OIHW
        gamma = np_(sd[f"{name}.bn.weight"])
        beta = np_(sd[f"{name}.bn.bias"])
        mean = np_(sd[f"{name}.bn.running_mean"])
        var = np_(sd[f"{name}.bn.running_var"])
        scale = gamma / np.sqrt(var + BN_EPS)
        w_folded = w * scale[:, None, None, None]
        b_folded = beta - mean * scale
        hwio = np.transpose(w_folded, (2, 3, 1, 0)).astype(np.float32)
        assert hwio.shape == (kh, kw, cin, cout), (name, hwio.shape)
        out[name + ".w"] = hwio
        out[name + ".b"] = b_folded.astype(np.float32)
    return out


def main():
    src, dst = sys.argv[1], sys.argv[2]
    import torch

    if src == "torchvision":
        import torchvision
        model = torchvision.models.inception_v3(weights="IMAGENET1K_V1",
                                                aux_logits=True)
        sd = model.state_dict()
    else:
        sd = torch.load(src, map_location="cpu")
        if hasattr(sd, "state_dict"):
            sd = sd.state_dict()
    np.savez_compressed(dst, **fold_state_dict(sd))
    print(f"wrote {dst}")


if __name__ == "__main__":
    main()
