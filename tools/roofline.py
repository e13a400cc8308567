"""Analytic speed-of-light (roofline) model of one RCOT minimax iteration.

Answers: what is the fastest this iteration can possibly run on a TPU v5e,
given the model's shapes — independent of any software stack? Every matmul
in the program is rate-limited by MXU tiling (a (M,K,N) matmul streams
ceil(K/128)*ceil(N/128) weight tiles through the 128x128 systolic array, so
utilization = K*N / (ceil128(K)*ceil128(N)) for K,N not multiples of 128 —
the RCOT dims 48/96/192 and the GDFN hiddens 127/255/510/1021 sit well below
lane alignment); every depthwise conv and elementwise pass is VPU-bound;
every tensor that must cross HBM is bandwidth-bound. Per site:

    t_site = max(flops / (MXU_peak * util), vpu_flops / VPU_peak,
                 bytes / HBM_bw)

and the program lower bound is sum over sites (no overlap assumed between
a site's own compute and its operand traffic — optimistic) — this is the
number the measured iteration should be compared against when judging "how
much is left", and it is what BENCH.md cites as the ceiling proof.

Hardware numbers (TPU v5e, public): 197 TFLOP/s bf16 MXU peak, ~819 GB/s
HBM; VPU fp32 taken as 6.1 TFLOP/s (8x128 lanes x 2 FLOP x 4 units x
~1.49 GHz estimate derived from the v5e 394 TOPS int8 figure).

Reference hot loop being modeled: trainer.py:247-346 (one WGAN + GP + T
update at batch 3, patch 128), restructured as our single-T-forward program
(train/steps.py) with fused block kernels (intermediates in VMEM — HBM
traffic counted only at kernel boundaries).

Usage: python tools/roofline.py [--batch 3] [--patch 128] [--json]
"""

from __future__ import annotations

import argparse
import json
import math

MXU_PEAK = 197e12       # bf16 FLOP/s
VPU_PEAK = 6.1e12       # fp32 FLOP/s (estimate, see docstring)
HBM_BW = 819e9          # bytes/s
ACT_BYTES = 2           # bf16 activations


def c128(n):
    return math.ceil(n / 128) * 128


def mxu_util(k, n):
    return (k * n) / (c128(k) * c128(n))


class Tally:
    def __init__(self):
        self.sites = []

    def matmul(self, name, m, k, n, count=1, bwd_factor=3):
        """A 1x1-conv / linear site: forward (m,k,n) matmul; backward adds
        dx (m,n,k) and dW (m-contraction, k x n output) — all three have the
        same k*n tile utilization, so time = bwd_factor * fwd_time.
        bwd_factor=3 counts fwd+dx+dW, 1 counts forward only."""
        fl = 2.0 * m * k * n * count
        tt = bwd_factor * fl / (MXU_PEAK * mxu_util(k, n))
        self.sites.append((name, fl * bwd_factor, tt, 0.0, 0.0))

    def vpu(self, name, flops, count=1):
        fl = flops * count
        self.sites.append((name, fl, fl / VPU_PEAK, fl / VPU_PEAK, 0.0))

    def hbm(self, name, bytes_):
        self.sites.append((name, 0.0, bytes_ / HBM_BW, 0.0, bytes_))

    def totals(self):
        t = sum(s[2] for s in self.sites)
        fl = sum(s[1] for s in self.sites)
        by = sum(s[4] for s in self.sites)
        return t, fl, by


def block_cost(t: Tally, tag, b, h, w, c, heads, ffn=2.66, passes=1,
               train=True):
    """One TransformerBlock: fused head/tail kernels + attention core.
    train=True counts forward+backward (+recompute) for the fused sites."""
    n = b * h * w
    hid = int(c * ffn)
    m2 = 2 * hid
    bwd = 3 if train else 1
    # kernel boundaries: x in, qkv out, attn in/out (transposes), y out
    t.hbm(f"{tag} hbm", passes * n * ACT_BYTES * (
        (c + 3 * c) + (3 * c + 3 * c) + (3 * c + c + c + c)
        + ((c + 3 * c + c + c + c) if train else 0)))   # bwd reads x,g + writes dx etc.
    for _ in range(passes):
        t.matmul(f"{tag} qkv1x1", n, c, 3 * c, bwd_factor=bwd)
        t.vpu(f"{tag} qkv_dw", 2 * 9 * n * 3 * c * (2 if train else 1))
        t.vpu(f"{tag} ln+misc", 10.0 * n * c * (3 if train else 1))
        # attention core: per batch & head, q@kT (ch,HW)@(HW,ch) and
        # attn@v (ch,ch)@(ch,HW) — contraction HW resp. ch, output tiles
        # ch x ch resp. ch x HW; ch = 48..64 here so tile util ~ ch/128.
        ch = c // heads
        fl = 2.0 * b * heads * ch * ch * (h * w) * 2          # qk + av
        tt = fl / (MXU_PEAK * mxu_util(ch, ch)) * (3 if train else 1)
        t.sites.append((f"{tag} attn_core", fl * (3 if train else 1),
                        tt, 0.0, 0.0))
        t.vpu(f"{tag} attn_norm+softmax",
              (8.0 * c * (h * w) * b + 6.0 * heads * ch * ch * b)
              * (3 if train else 1))
        t.matmul(f"{tag} proj", n, c, c, bwd_factor=bwd)
        t.matmul(f"{tag} gdfn_in", n, c, m2, bwd_factor=bwd)
        t.vpu(f"{tag} gdfn_dw", 2 * 9 * n * m2 * (2 if train else 1))
        t.vpu(f"{tag} gelu_gate", 12.0 * n * hid * (2 if train else 1))
        t.matmul(f"{tag} gdfn_out", n, hid, c, bwd_factor=bwd)


def tnet_cost(t: Tally, b, p, dim=48, blocks=(4, 6, 6, 8), heads=(1, 2, 4, 8),
              refin=4, train=True):
    """Two-pass RCOT T_net + residual branch (single-forward program)."""
    d = [dim, dim * 2, dim * 4, dim * 8]
    hw = [(p, p), (p // 2, p // 2), (p // 4, p // 4), (p // 8, p // 8)]
    # encoder pass1 + res branch encoder (x2), decoder x2 passes
    for lvl in range(3):
        h, w = hw[lvl]
        block_cost(t, f"enc{lvl+1}", b, h, w, d[lvl], heads[lvl],
                   passes=2, train=train)
        for _ in range(blocks[lvl] - 1):
            block_cost(t, f"enc{lvl+1}", b, h, w, d[lvl], heads[lvl],
                       passes=2, train=train)
    h, w = hw[3]
    for _ in range(blocks[3]):
        block_cost(t, "latent", b, h, w, d[3], heads[3], passes=2,
                   train=train)
    # decoder runs twice (pass1 + pass2)
    dec_dims = [(d[2], heads[2], blocks[2], hw[2]),
                (d[1], heads[1], blocks[1], hw[1]),
                (d[1], heads[0], blocks[0], hw[0])]
    for dd, hh, nb, (h, w) in dec_dims:
        for _ in range(nb):
            block_cost(t, f"dec{dd}", b, h, w, dd, hh, passes=2, train=train)
    for _ in range(refin):
        block_cost(t, "refine", b, p, p, d[1], heads[0], passes=2,
                   train=train)
    # conditioning blocks (noise_level*, run in both decoder passes)
    block_cost(t, "cond3", b, *hw[3], d[3], heads[2], passes=2, train=train)
    block_cost(t, "cond2", b, *hw[1], d[1] * 2, heads[2], passes=2,
               train=train)
    block_cost(t, "cond1", b, *hw[0], d[1], heads[2], passes=2, train=train)
    bwdf = 3 if train else 1
    # resamplers + embed + reduces + output (3x3 convs as dense matmuls K=9C)
    n1 = b * p * p
    t.matmul("patch_embed", n1, 9 * 3, dim, count=1, bwd_factor=bwdf)
    for lvl in range(3):
        h, w = hw[lvl]
        nn = b * h * w
        t.matmul(f"down{lvl}", nn, 9 * d[lvl], d[lvl] // 2, bwd_factor=bwdf)
    for lvl in (3, 2, 1):
        h, w = hw[lvl]
        nn = b * h * w
        t.matmul(f"up{lvl}", nn, 9 * d[lvl], d[lvl] * 2, bwd_factor=bwdf)
    t.matmul("reduce3", b * hw[2][0] ** 2, d[2] + d[2] // 2, d[2],
             bwd_factor=bwdf)
    t.matmul("reduce2", b * hw[1][0] ** 2, d[2], d[1], bwd_factor=bwdf)
    t.matmul("rnoise3", b * hw[3][0] ** 2, d[3], d[2], bwd_factor=bwdf)
    t.matmul("rnoise2", b * hw[1][0] ** 2, d[1] * 2, d[1] * 2,
             bwd_factor=bwdf)
    t.matmul("rnoise1", b * hw[0][0] ** 2, d[1], d[1], bwd_factor=bwdf)
    t.matmul("output", n1, 9 * d[1], 3, count=2, bwd_factor=bwdf)


def critic_cost(t: Tally, b, p, passes_fwd=3.0, passes_bwd=3.0):
    """F_net convs: fwd on real+fake (batch 2b, counted via passes), one
    param backward, GP double-backward ~= 2 extra passes. passes are in
    units of single-batch forward equivalents."""
    specs = [(3, 64, 5, 1), (64, 64, 4, 2), (64, 128, 3, 1),
             (128, 128, 4, 2), (128, 256, 3, 1), (256, 256, 4, 2),
             (256, 512, 3, 1), (512, 512, 4, 2), (512, 512, 3, 1),
             (512, 512, 4, 2)]
    h = p
    total_eq = passes_fwd + 2 * passes_bwd
    for i, (ci, co, k, s) in enumerate(specs):
        h_out = h // s
        n = b * h_out * h_out
        fl = 2.0 * n * ci * k * k * co * total_eq
        util = mxu_util(ci * k * k, co)
        t.sites.append((f"critic conv{i}", fl, fl / (MXU_PEAK * util),
                        0.0, 0.0))
        h = h_out
    t.matmul("critic fc", b, p * p // 2, p * p // 8,
             bwd_factor=3)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=3)
    ap.add_argument("--patch", type=int, default=128)
    ap.add_argument("--infer", action="store_true",
                    help="forward-only T_net (no critic, no backward): the "
                         "inference speed-of-light — VERDICT r3 #3 asked the "
                         "img/s headline to get the same ceiling framing "
                         "training has")
    ap.add_argument("--json", action="store_true")
    args = ap.parse_args()

    t = Tally()
    tnet_cost(t, args.batch, args.patch, train=not args.infer)
    if not args.infer:
        critic_cost(t, args.batch, args.patch)

    sol, fl, by = t.totals()
    mm = sum(s[2] for s in t.sites if s[3] == 0.0 and s[4] == 0.0)
    vp = sum(s[2] for s in t.sites if s[3] > 0.0)
    hb = sum(s[2] for s in t.sites if s[4] > 0.0)
    out = {
        "speed_of_light_sec_per_iter": round(sol, 5),
        "mxu_limited_sec": round(mm, 5),
        "vpu_limited_sec": round(vp, 5),
        "hbm_limited_sec": round(hb, 5),
        "counted_flops": round(fl / 1e12, 3),
        "kernel_boundary_bytes_gb": round(by / 1e9, 3),
        "sol_patches_per_sec": round(args.batch / sol, 1),
        "mode": "inference-forward-only" if args.infer else "train-minimax",
        "assumptions": "197 TF/s MXU bf16, 6.1 TF/s VPU fp32, 819 GB/s HBM;"
                       " no overlap between sites; fused-kernel HBM traffic"
                       " only at kernel boundaries; backward = 2x forward"
                       " matmuls + recompute",
    }
    print(json.dumps(out, indent=2))
    if not args.json:
        top = sorted(t.sites, key=lambda s: -s[2])[:12]
        print("\ntop sites (name, GFLOP, SoL ms):")
        for s in top:
            print(f"  {s[0]:24s} {s[1] / 1e9:10.1f} {s[2] * 1e3:8.3f}")


if __name__ == "__main__":
    main()
