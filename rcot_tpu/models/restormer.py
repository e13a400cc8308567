"""RCOT transport map: two-pass residual-conditioned Restormer (NHWC, pure fn).

Behavioral spec (reference: Net_Restormer.py:215-434):
- 4-level U-shaped transformer: dims (48, 96, 192, 384), blocks (4, 6, 6, 8),
  heads (1, 2, 4, 8), 4 refinement blocks, ffn_expansion_factor 2.66.
- Pass 1: embed -> encoder -> latent -> [cond blocks] -> decoder -> conv + input.
- Transport residual: res = input - out1 (Net_Restormer.py:377).
- Residual branch: embed(res) -> resencoder levels (separate params, but the
  level-3->4 downsample is the SHARED down3_4, Net_Restormer.py:393) -> reslatent.
- Conditioning: latent += 0.8 * reslatent when decoder=True (Net_Restormer.py:400-401).
- Pass 2: the same decoder stack re-run on the conditioned latent.

TPU-native deviations (behavior-preserving):
- NHWC activations; pure function of a param pytree; both passes and the
  residual branch trace into ONE XLA program (the reference's pass-2
  `latent = self.latent(inp_enc_level4)` recompute at Net_Restormer.py:397 is
  numerically identical to pass 1's, so we compute it once and let XLA share it).
- No filesystem writes inside forward (the reference saves res.png in the hot
  path, Net_Restormer.py:433 — SURVEY.md §2.2 #7).
- Returns (out2, out1, res) so callers get the base restoration and transport
  residual without re-running anything.

Parameter parity: with parity_params=True the defined-but-unused reference
modules are also instantiated, pinning total params to 46,853,150.
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from ..utils import rng as rnglib
from ..ops.attention import init_mdta, mdta
from ..ops.conv import conv2d, init_conv2d
from ..ops.gdfn import gdfn, init_gdfn
from ..ops.layernorm import init_layernorm, layernorm
from ..ops.resample import downsample, init_downsample, init_upsample, upsample
from ..utils.config import ModelConfig


# ---------------------------------------------------------------- blocks

def init_transformer_block(key, dim: int, num_heads: int, ffn_factor: float,
                           *, bias: bool, ln_bias: bool, ffn_multiple: int = 1,
                           dtype=jnp.float32) -> dict:
    k1, k2 = rnglib.split(key)
    return {
        "norm1": init_layernorm(dim, bias=ln_bias, dtype=dtype),
        "attn": init_mdta(k1, dim, num_heads, bias=bias, dtype=dtype),
        "norm2": init_layernorm(dim, bias=ln_bias, dtype=dtype),
        "ffn": init_gdfn(k2, dim, ffn_factor, bias=bias,
                         hidden_multiple=ffn_multiple, dtype=dtype),
    }


def transformer_block(p: dict, x: jax.Array, num_heads: int) -> jax.Array:
    from ..ops import dispatch
    mode = dispatch.block_mode() if dispatch.pallas_enabled() else "off"
    if (mode != "off" and "b" not in p["attn"]["qkv"]
            and not dispatch.any_ablate()):
        # Fused-block path (ops/pallas_block.py): LN1+qkv+dw in one kernel,
        # XLA (or gram-kernel) attention core, then either the fused tail
        # (proj+residual+LN2+GDFN+residual, mode "full") or the composed
        # tail (mode "head" — used when the gram tier is active, whose
        # backward cannot share a program with the tail backward).
        from ..ops.attention import mdta_core, mdta_qkv
        from ..ops.pallas_block import block_head, block_tail
        interp = dispatch.pallas_interpret()
        at, f = p["attn"], p["ffn"]
        if mode == "tail":
            # tail-kernel-only composition: composed LN1 + fused-tier qkv
            # instead of the head kernel (fewer Mosaic kernels per program)
            qkv = mdta_qkv(at, layernorm(p["norm1"], x))
        else:
            qkv = block_head(
                x, jnp.asarray(p["norm1"]["w"]), _ln_b(p["norm1"]),
                at["qkv"]["w"][0, 0].astype(x.dtype),
                at["qkv_dw"]["w"][:, :, 0, :].astype(x.dtype),
                interpret=interp)
        a = mdta_core(at, qkv, num_heads)
        if mode in ("full", "tail"):
            return block_tail(
                x, a, at["proj"]["w"][0, 0].astype(x.dtype),
                jnp.asarray(p["norm2"]["w"]), _ln_b(p["norm2"]),
                f["proj_in"]["w"][0, 0].astype(x.dtype),
                f["dw"]["w"][:, :, 0, :].astype(x.dtype),
                f["proj_out"]["w"][0, 0].astype(x.dtype), interpret=interp)
        x = x + conv2d(at["proj"], a)
        x = x + gdfn(f, layernorm(p["norm2"], x))
        return x
    x = x + mdta(p["attn"], layernorm(p["norm1"], x), num_heads)
    x = x + gdfn(p["ffn"], layernorm(p["norm2"], x))
    return x


def _ln_b(norm_params: dict):
    return jnp.asarray(norm_params["b"]) if "b" in norm_params else None


def init_block_stack(key, n: int, dim: int, num_heads: int, ffn_factor: float,
                     *, bias: bool, ln_bias: bool, ffn_multiple: int = 1,
                     dtype=jnp.float32) -> list:
    keys = rnglib.split(key, n)
    return [init_transformer_block(k, dim, num_heads, ffn_factor, bias=bias,
                                   ln_bias=ln_bias, ffn_multiple=ffn_multiple,
                                   dtype=dtype)
            for k in keys]


def block_stack(ps: list, x: jax.Array, num_heads: int) -> jax.Array:
    """Apply a stack of identical-config transformer blocks.

    RCOT_SCAN_BLOCKS=1 runs the stack as ONE lax.scan over stacked params —
    dedupes the repeated block HLO so the whole-model program compiles far
    faster (useful against this sandbox's multi-minute remote compiles), at
    the cost of whatever cross-block fusion XLA would have found. Default is
    the unrolled loop (numerically identical either way).

    RCOT_SCAN_MIN_BLOCKS=N limits the scan to stacks of >= N blocks: N=8
    scans only the two latent stacks (8 blocks at 16^2 where cross-block
    fusion matters least) while levels 1-3 stay unrolled — a middle point
    that still shrinks the HLO enough to admit compositions the compile
    helper rejects unrolled (measured round 3: full-scan broke the
    gram+block-FULL wall but lost ~30% runtime to defused blocks).

    RCOT_REMAT=1 wraps each block in jax.checkpoint (rematerialize block
    internals in the backward instead of storing them) — trades ~recompute
    for activation memory so larger batches fit HBM (batch 12 at patch 128
    OOMs without it).
    """
    import os
    block = transformer_block
    if os.environ.get("RCOT_REMAT", "") not in ("", "0"):
        block = jax.checkpoint(transformer_block, static_argnums=(2,))
    min_blocks = int(os.environ.get("RCOT_SCAN_MIN_BLOCKS", "2") or 2)
    if (len(ps) >= max(min_blocks, 2)
            and os.environ.get("RCOT_SCAN_BLOCKS", "") not in ("", "0")):
        stacked = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *ps)

        def body(h, p):
            return block(p, h, num_heads), None

        x, _ = jax.lax.scan(body, x, stacked)
        return x
    for p in ps:
        x = block(p, x, num_heads)
    return x


# ---------------------------------------------------------------- T_net

def init_tnet(key, cfg: ModelConfig, dtype=jnp.float32) -> Dict:
    """Build the full RCOT transport-map param pytree (numpy-backed for
    concrete keys — see utils/rng.py)."""
    key = rnglib.ensure_host(key)
    d1, d2, d3, d4 = cfg.dims
    h = cfg.heads
    ffn = cfg.ffn_expansion_factor
    bias = cfg.bias
    ln_bias = cfg.layernorm_type == "WithBias"
    ks = iter(rnglib.split(key, 40))

    ffn_mult = getattr(cfg, "ffn_hidden_multiple", 1)

    def stack(n, dim, heads):
        return init_block_stack(next(ks), n, dim, heads, ffn, bias=bias,
                                ln_bias=ln_bias, ffn_multiple=ffn_mult,
                                dtype=dtype)

    def block(dim, heads):
        return init_transformer_block(next(ks), dim, heads, ffn, bias=bias,
                                      ln_bias=ln_bias, ffn_multiple=ffn_mult,
                                      dtype=dtype)

    nb = cfg.num_blocks
    p: Dict = {
        "patch_embed": init_conv2d(next(ks), cfg.inp_channels, d1, 3, bias=bias, dtype=dtype),
        "encoder_level1": stack(nb[0], d1, h[0]),
        "resencoder_level1": stack(nb[0], d1, h[0]),
        "down1_2": init_downsample(next(ks), d1, dtype=dtype),
        "resdown1_2": init_downsample(next(ks), d1, dtype=dtype),
        "encoder_level2": stack(nb[1], d2, h[1]),
        "resencoder_level2": stack(nb[1], d2, h[1]),
        "down2_3": init_downsample(next(ks), d2, dtype=dtype),
        "resdown2_3": init_downsample(next(ks), d2, dtype=dtype),
        "encoder_level3": stack(nb[2], d3, h[2]),
        "resencoder_level3": stack(nb[2], d3, h[2]),
        "down3_4": init_downsample(next(ks), d3, dtype=dtype),  # SHARED by res branch
        "latent": stack(nb[3], d4, h[3]),
        "reslatent": stack(nb[3], d4, h[3]),
        # Conditioning-block dims written via the channel algebra they must
        # satisfy; at dim=48 they equal the reference's literal constants
        # (e.g. noise_level3 dim d4 == 192+192, Net_Restormer.py:284;
        # reduce_chan_level3 in 3*d3//2 == 96+192, Net_Restormer.py:282).
        "up4_3": init_upsample(next(ks), d3, dtype=dtype),
        "reduce_chan_level3": init_conv2d(next(ks), d3 + d3 // 2, d3, 1, bias=bias, dtype=dtype),
        "noise_level3": block(d4, h[2]),
        "reduce_noise_level3": init_conv2d(next(ks), d4, d3, 1, bias=bias, dtype=dtype),
        "decoder_level3": stack(nb[2], d3, h[2]),
        "up3_2": init_upsample(next(ks), d3, dtype=dtype),
        "reduce_chan_level2": init_conv2d(next(ks), d3, d2, 1, bias=bias, dtype=dtype),
        "noise_level2": block(d2 * 2, h[2]),
        "reduce_noise_level2": init_conv2d(next(ks), d2 * 2, d2 * 2, 1, bias=bias, dtype=dtype),
        "decoder_level2": stack(nb[1], d2, h[1]),
        "up2_1": init_upsample(next(ks), d2, dtype=dtype),
        "noise_level1": block(d2, h[2]),
        "reduce_noise_level1": init_conv2d(next(ks), d2, d2, 1, bias=bias, dtype=dtype),
        "decoder_level1": stack(nb[0], d2, h[0]),
        "refinement": init_block_stack(next(ks), cfg.num_refinement_blocks, d2,
                                       h[0], ffn, bias=bias, ln_bias=ln_bias,
                                       ffn_multiple=ffn_mult, dtype=dtype),
        "output": init_conv2d(next(ks), d2, cfg.out_channels, 3, bias=bias, dtype=dtype),
    }
    if cfg.parity_params:
        # Defined-but-never-called reference modules (SURVEY.md §2.2; they pin
        # the 46,853,150 total). Gradients are structurally zero.
        p["unused"] = {
            "res_patch_embed": init_conv2d(next(ks), cfg.inp_channels, d1, 3, bias=bias, dtype=dtype),
            "chnl_reduce1": init_conv2d(next(ks), 64, 64, 1, bias=bias, dtype=dtype),
            "chnl_reduce2": init_conv2d(next(ks), 128, 128, 1, bias=bias, dtype=dtype),
            "chnl_reduce3": init_conv2d(next(ks), 320, 256, 1, bias=bias, dtype=dtype),
            "reduce_noise_channel_1": init_conv2d(next(ks), d1 + 64, d1, 1, bias=bias, dtype=dtype),
            "reduce_noise_channel_2": init_conv2d(next(ks), d2 + 128, d2, 1, bias=bias, dtype=dtype),
            "reduce_noise_channel_3": init_conv2d(next(ks), d3 + 256, d3, 1, bias=bias, dtype=dtype),
            "resdown3_4": init_downsample(next(ks), d3, dtype=dtype),
            "resnoise_level3": block(d4, h[2]),
            "resreduce_noise_level3": init_conv2d(next(ks), d4, d3, 1, bias=bias, dtype=dtype),
        }
    return p


def _encode(p: Dict, x: jax.Array, cfg: ModelConfig, *, res_branch: bool):
    """Shared 4-level encoder. The res branch re-uses patch_embed and down3_4
    but has its own level blocks/downsamples (reference: Net_Restormer.py:381-395)."""
    h = cfg.heads
    pre = "res" if res_branch else ""
    e1 = block_stack(p[pre + "encoder_level1"], conv2d(p["patch_embed"], x), h[0])
    e2 = block_stack(p[pre + "encoder_level2"], downsample(p[pre + "down1_2"], e1), h[1])
    e3 = block_stack(p[pre + "encoder_level3"], downsample(p[pre + "down2_3"], e2), h[2])
    e4 = downsample(p["down3_4"], e3)
    latent = block_stack(p["reslatent" if res_branch else "latent"], e4, h[3])
    return e1, e2, e3, latent


def _decode(p: Dict, latent: jax.Array, e1, e2, e3, inp_img: jax.Array,
            cfg: ModelConfig) -> jax.Array:
    """Decoder stack, shared verbatim between pass 1 and pass 2
    (reference: Net_Restormer.py:345-375 and 400-432).

    The conditioning blocks (noise_level*/reduce_noise_level*) run
    unconditionally: the reference gates them on `decoder` but its
    decoder=False path is structurally broken anyway (the raw 384-channel
    latent would hit up4_3's 192->384 conv, Net_Restormer.py:281,349), so in
    this build `decoder` only controls the residual-conditioned second pass.
    """
    h = cfg.heads
    latent = transformer_block(p["noise_level3"], latent, h[2])
    latent = conv2d(p["reduce_noise_level3"], latent)
    d3 = upsample(p["up4_3"], latent)
    d3 = conv2d(p["reduce_chan_level3"], jnp.concatenate([d3, e3], axis=-1))
    d3 = block_stack(p["decoder_level3"], d3, h[2])
    d3 = transformer_block(p["noise_level2"], d3, h[2])
    d3 = conv2d(p["reduce_noise_level2"], d3)
    d2 = upsample(p["up3_2"], d3)
    d2 = conv2d(p["reduce_chan_level2"], jnp.concatenate([d2, e2], axis=-1))
    d2 = block_stack(p["decoder_level2"], d2, h[1])
    d2 = transformer_block(p["noise_level1"], d2, h[2])
    d2 = conv2d(p["reduce_noise_level1"], d2)
    d1 = jnp.concatenate([upsample(p["up2_1"], d2), e1], axis=-1)
    d1 = block_stack(p["decoder_level1"], d1, h[0])
    d1 = block_stack(p["refinement"], d1, h[0])
    return conv2d(p["output"], d1) + inp_img


def apply_tnet(p: Dict, inp_img: jax.Array, cfg: ModelConfig,
               *, single_pass: bool = False) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Full RCOT forward. inp_img: (B, H, W, C) with H, W % 8 == 0.

    Returns (out2, out1, res): final restoration, base (pass-1) restoration,
    and the transport residual. With single_pass=True (or decoder=False, where
    pass 2 would be identical anyway) only pass 1 runs and out2 == out1.
    """
    e1, e2, e3, latent = _encode(p, inp_img, cfg, res_branch=False)
    out1 = _decode(p, latent, e1, e2, e3, inp_img, cfg)
    res = inp_img - out1
    if single_pass or not cfg.decoder:
        return out1, out1, res

    _, _, _, reslatent = _encode(p, res, cfg, res_branch=True)
    # Residual conditioning on the latent (reference: Net_Restormer.py:400-401).
    latent2 = latent + cfg.latent_cond_scale * reslatent
    out2 = _decode(p, latent2, e1, e2, e3, inp_img, cfg)
    return out2, out1, res


def count_params(p) -> int:
    return sum(x.size for x in jax.tree_util.tree_leaves(p))
