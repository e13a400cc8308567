"""Port reference PyTorch checkpoints into rcot-tpu param pytrees.

The reference pickles whole nn.Module objects ({"epoch", "Tnet", "Fnet"},
reference: trainer.py:362-371) and distributes legacy {model, discr} weights
(trainer.py:110-117). This module converts a torch state_dict (name -> tensor)
into our NHWC/HWIO pytrees so reference-trained weights run on TPU:

- Conv2d weight OIHW -> HWIO transpose; depthwise (O,1,H,W) -> (H,W,1,O).
- Linear weight (out, in) -> (in, out) transpose; the critic's first FC also
  permutes its input rows from torch's flatten order (C, H, W) to our NHWC
  flatten order (H, W, C) (see models/critic.py docstring).
- LayerNorm weight/bias and the MDTA temperature pass through.

Works from either a live torch state_dict (tensors) or a {name: np.ndarray}
dict (so tests don't require torch).
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Mapping

import numpy as np

from ..utils.config import CriticConfig, ModelConfig


def _np(t) -> np.ndarray:
    if hasattr(t, "detach"):
        t = t.detach().cpu().numpy()
    return np.asarray(t)


def conv_w(t) -> np.ndarray:
    """torch OIHW -> HWIO (covers depthwise (O,1,kh,kw) too)."""
    return np.transpose(_np(t), (2, 3, 1, 0))


def linear_w(t) -> np.ndarray:
    return np.transpose(_np(t), (1, 0))


class _SD:
    """state_dict view with exact-match + consumption tracking."""

    def __init__(self, sd: Mapping[str, object]):
        self.sd = dict(sd)
        self.used = set()

    def take(self, name: str):
        self.used.add(name)
        return self.sd[name]

    def has(self, name: str) -> bool:
        return name in self.sd

    def unused(self):
        return sorted(set(self.sd) - self.used)


def _port_conv(sd: _SD, prefix: str) -> Dict:
    p = {"w": conv_w(sd.take(prefix + ".weight"))}
    if sd.has(prefix + ".bias"):
        p["b"] = _np(sd.take(prefix + ".bias"))
    return p


def _as_sd(sd_in) -> _SD:
    return sd_in if isinstance(sd_in, _SD) else _SD(sd_in)


def check_fully_ported(sd: _SD, what: str, benign_substrings=()) -> None:
    """Raise if checkpoint weights were left unconsumed by the port — a
    silent leftover means the loaded model has a DIFFERENT architecture than
    was trained (e.g. more refinement blocks than the caller's config), which
    surfaces as mysteriously bad PSNR instead of a load error.
    RCOT_PORT_ALLOW_UNUSED=1 downgrades to a warning (exotic checkpoints)."""
    import os

    leftovers = [k for k in sd.unused()
                 if not any(b in k for b in benign_substrings)]
    if not leftovers:
        return
    msg = (f"{len(leftovers)} {what} weights in the checkpoint were not "
           f"ported — architecture/config mismatch (e.g. a different block "
           f"count than the target config). First few: {leftovers[:5]}")
    if os.environ.get("RCOT_PORT_ALLOW_UNUSED", "") in ("", "0"):
        raise ValueError(msg + ". Set RCOT_PORT_ALLOW_UNUSED=1 to load anyway.")
    print(f"warning: {msg}; loading anyway (RCOT_PORT_ALLOW_UNUSED).")


def _port_ln(sd: _SD, prefix: str) -> Dict:
    p = {"w": _np(sd.take(prefix + ".body.weight"))}
    if sd.has(prefix + ".body.bias"):
        p["b"] = _np(sd.take(prefix + ".body.bias"))
    return p


def _port_block(sd: _SD, prefix: str) -> Dict:
    return {
        "norm1": _port_ln(sd, prefix + ".norm1"),
        "attn": {
            "temperature": _np(sd.take(prefix + ".attn.temperature")),
            "qkv": _port_conv(sd, prefix + ".attn.qkv"),
            "qkv_dw": _port_conv(sd, prefix + ".attn.qkv_dwconv"),
            "proj": _port_conv(sd, prefix + ".attn.project_out"),
        },
        "norm2": _port_ln(sd, prefix + ".norm2"),
        "ffn": {
            "proj_in": _port_conv(sd, prefix + ".ffn.project_in"),
            "dw": _port_conv(sd, prefix + ".ffn.dwconv"),
            "proj_out": _port_conv(sd, prefix + ".ffn.project_out"),
        },
    }


def _port_stack(sd: _SD, prefix: str, n: int) -> list:
    return [_port_block(sd, f"{prefix}.{i}") for i in range(n)]


def _port_resample(sd: _SD, prefix: str) -> Dict:
    # reference wraps the conv in nn.Sequential: '<prefix>.body.0'
    return {"conv": _port_conv(sd, prefix + ".body.0")}


def port_tnet_state_dict(sd_in: Mapping[str, object], cfg: ModelConfig) -> Dict:
    """Reference T_net state_dict -> rcot-tpu param pytree (init_tnet layout)."""
    sd = _as_sd(sd_in)
    nb = cfg.num_blocks
    p: Dict = {
        "patch_embed": _port_conv(sd, "patch_embed.proj"),
        "encoder_level1": _port_stack(sd, "encoder_level1", nb[0]),
        "resencoder_level1": _port_stack(sd, "resencoder_level1", nb[0]),
        "down1_2": _port_resample(sd, "down1_2"),
        "resdown1_2": _port_resample(sd, "resdown1_2"),
        "encoder_level2": _port_stack(sd, "encoder_level2", nb[1]),
        "resencoder_level2": _port_stack(sd, "resencoder_level2", nb[1]),
        "down2_3": _port_resample(sd, "down2_3"),
        "resdown2_3": _port_resample(sd, "resdown2_3"),
        "encoder_level3": _port_stack(sd, "encoder_level3", nb[2]),
        "resencoder_level3": _port_stack(sd, "resencoder_level3", nb[2]),
        "down3_4": _port_resample(sd, "down3_4"),
        "latent": _port_stack(sd, "latent", nb[3]),
        "reslatent": _port_stack(sd, "reslatent", nb[3]),
        "up4_3": _port_resample(sd, "up4_3"),
        "reduce_chan_level3": _port_conv(sd, "reduce_chan_level3"),
        "noise_level3": _port_block(sd, "noise_level3"),
        "reduce_noise_level3": _port_conv(sd, "reduce_noise_level3"),
        "decoder_level3": _port_stack(sd, "decoder_level3", nb[2]),
        "up3_2": _port_resample(sd, "up3_2"),
        "reduce_chan_level2": _port_conv(sd, "reduce_chan_level2"),
        "noise_level2": _port_block(sd, "noise_level2"),
        "reduce_noise_level2": _port_conv(sd, "reduce_noise_level2"),
        "decoder_level2": _port_stack(sd, "decoder_level2", nb[1]),
        "up2_1": _port_resample(sd, "up2_1"),
        "noise_level1": _port_block(sd, "noise_level1"),
        "reduce_noise_level1": _port_conv(sd, "reduce_noise_level1"),
        "decoder_level1": _port_stack(sd, "decoder_level1", nb[0]),
        "refinement": _port_stack(sd, "refinement", cfg.num_refinement_blocks),
        "output": _port_conv(sd, "output"),
    }
    if cfg.parity_params:
        p["unused"] = {
            "res_patch_embed": _port_conv(sd, "res_patch_embed.proj"),
            "chnl_reduce1": _port_conv(sd, "chnl_reduce1"),
            "chnl_reduce2": _port_conv(sd, "chnl_reduce2"),
            "chnl_reduce3": _port_conv(sd, "chnl_reduce3"),
            "reduce_noise_channel_1": _port_conv(sd, "reduce_noise_channel_1"),
            "reduce_noise_channel_2": _port_conv(sd, "reduce_noise_channel_2"),
            "reduce_noise_channel_3": _port_conv(sd, "reduce_noise_channel_3"),
            "resdown3_4": _port_resample(sd, "resdown3_4"),
            "resnoise_level3": _port_block(sd, "resnoise_level3"),
            "resreduce_noise_level3": _port_conv(sd, "resreduce_noise_level3"),
        }
    return p


# critic conv layer indices inside the reference's nn.Sequential 'features'
# (LeakyReLU layers interleave at odd indices; reference: Net_Restormer.py:440-490).
_FNET_FEATURE_IDX = [0, 2, 4, 6, 8, 10, 12, 14, 16, 18]


def port_fnet_state_dict(sd_in: Mapping[str, object], cfg: CriticConfig) -> Dict:
    sd = _as_sd(sd_in)
    convs = [_port_conv(sd, f"features.{i}") for i in _FNET_FEATURE_IDX]

    # fc input rows: torch flattens (C, H, W); we flatten (H, W, C).
    side = cfg.patch_size // 32
    w = linear_w(sd.take("fc.weight"))  # (in, out) after transpose
    n_in, n_out = w.shape
    w = w.reshape(512, side, side, n_out)        # torch order (C, H, W)
    w = np.transpose(w, (1, 2, 0, 3)).reshape(n_in, n_out)  # -> (H, W, C)
    fc = {"w": w, "b": _np(sd.take("fc.bias"))}
    fc1 = {"w": linear_w(sd.take("fc1.weight")), "b": _np(sd.take("fc1.bias"))}
    fc2 = {"w": linear_w(sd.take("fc2.weight")), "b": _np(sd.take("fc2.bias"))}
    return {"convs": convs, "fc": fc, "fc1": fc1, "fc2": fc2}


def _port_cab(sd: _SD, prefix: str) -> Dict:
    """Legacy CAB (reference: Net.py:57-72): body.0/body.2 convs + CA 1x1s."""
    return {
        "conv1": _port_conv(sd, prefix + ".body.0"),
        "conv2": _port_conv(sd, prefix + ".body.2"),
        "ca_down": _port_conv(sd, prefix + ".CA.conv_du.0"),
        "ca_up": _port_conv(sd, prefix + ".CA.conv_du.2"),
    }


def _port_legacy_encoder(sd: _SD, prefix: str, *, csff: bool) -> Dict:
    p = {
        "level1": [_port_cab(sd, f"{prefix}.encoder_level1.{i}") for i in range(2)],
        "level2": [_port_cab(sd, f"{prefix}.encoder_level2.{i}") for i in range(2)],
        "level3": [_port_cab(sd, f"{prefix}.encoder_level3.{i}") for i in range(2)],
        "down12": _port_conv(sd, prefix + ".down12.down.1"),
        "down23": _port_conv(sd, prefix + ".down23.down.1"),
    }
    if csff:
        for i in (1, 2, 3):
            p[f"csff_enc{i}"] = _port_conv(sd, f"{prefix}.csff_enc{i}")
            p[f"csff_dec{i}"] = _port_conv(sd, f"{prefix}.csff_dec{i}")
    return p


def port_mprnet_state_dict(sd_in: Mapping[str, object]) -> Dict:
    """Legacy Net.py T_net state_dict -> models/mprnet.py pytree (the
    distributed pretrained GDrive weights use this backbone, README.md:118-120).

    The single shared nn.PReLU appears in the state_dict under the first
    module that registered it (shallow_feat1.1.body.1.weight)."""
    sd = _as_sd(sd_in)
    p: Dict = {
        "prelu_a": _np(sd.take("shallow_feat1.1.body.1.weight")),
        "shallow_feat1": {
            "conv": _port_conv(sd, "shallow_feat1.0"),
            "cab": _port_cab(sd, "shallow_feat1.1"),
        },
        "res_shallow_feat1": {
            "conv": _port_conv(sd, "res_shallow_feat1.0"),
            "cab": _port_cab(sd, "res_shallow_feat1.1"),
        },
        "stage1_encoder": _port_legacy_encoder(sd, "stage1_encoder", csff=False),
        "stage1_resencoder": _port_legacy_encoder(sd, "stage1_resencoder", csff=True),
        "stage1_decoder": {
            "level1": [_port_cab(sd, f"stage1_decoder.decoder_level1.{i}") for i in range(2)],
            "level2": [_port_cab(sd, f"stage1_decoder.decoder_level2.{i}") for i in range(2)],
            "level3": [_port_cab(sd, f"stage1_decoder.decoder_level3.{i}") for i in range(2)],
            "skip_attn1": _port_cab(sd, "stage1_decoder.skip_attn1"),
            "skip_attn2": _port_cab(sd, "stage1_decoder.skip_attn2"),
            "up21": _port_conv(sd, "stage1_decoder.up21.up.1"),
            "up32": _port_conv(sd, "stage1_decoder.up32.up.1"),
        },
        "sam12": {
            "conv1": _port_conv(sd, "sam12.conv1"),
            "conv2": _port_conv(sd, "sam12.conv2"),
            "conv3": _port_conv(sd, "sam12.conv3"),
        },
    }
    return p


def detect_backbone(t_sd: Mapping[str, object]) -> str:
    """Which T_net a reference state_dict belongs to: the legacy MPRNet-style
    backbone registers `shallow_feat1.*` modules (Net.py:184), the Restormer
    one `patch_embed.*` (Net_Restormer.py:230)."""
    for k in t_sd:
        if k.startswith("shallow_feat1"):
            return "mprnet"
    return "restormer"


def load_reference_checkpoint(path: str, model_cfg: ModelConfig,
                              critic_cfg: CriticConfig,
                              backbone: str = "restormer"):
    """Load a reference .pth (pickled modules) -> (t_params, f_params, epoch).

    backbone: 'restormer' | 'mprnet' | 'auto' (sniff the state_dict — the
    distributed GDrive weights use the legacy MPRNet backbone, README.md:118).
    Returns (t_params, f_params, epoch, backbone) with backbone resolved.
    Requires torch at call time (the pickle embeds nn.Module classes, so this
    only works where the reference code is importable; primarily a tooling
    path, not a runtime one)."""
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    t_sd = _SD(ckpt["Tnet"].state_dict())
    f_sd = _SD(ckpt["Fnet"].state_dict())
    if backbone == "auto":
        backbone = detect_backbone(t_sd.sd)
    if backbone == "mprnet":
        t_params = port_mprnet_state_dict(t_sd)
        # the single shared nn.PReLU registers under EVERY module path that
        # references it (state_dict does not deduplicate shared params); the
        # porter takes the first — the duplicates are benign leftovers
        check_fully_ported(t_sd, "T_net", benign_substrings=(".body.1.weight",))
        # the legacy critic head is FIXED at 512*8*8 -> 2048 (patch 256,
        # Net.py:275) regardless of the caller's training patch config
        critic_cfg = dataclasses.replace(critic_cfg, patch_size=256,
                                         fc_mid=2048, head="flatten")
    else:
        t_params = port_tnet_state_dict(t_sd, model_cfg)
        check_fully_ported(t_sd, "T_net")
    f_params = port_fnet_state_dict(f_sd, critic_cfg)
    check_fully_ported(f_sd, "F_net")
    return (t_params, f_params, int(ckpt.get("epoch", 0)), backbone)
