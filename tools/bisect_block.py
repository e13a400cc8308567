"""Bisect which fused_block backward shapes crash the remote TPU compiler.

The whole-iteration compile with RCOT_PALLAS_BLOCK=1 dies with the
compile-helper HTTP 500 (perf/probe_r2.jsonl 20:15); the forward-only
program compiles and runs. This compiles each UNIQUE (config, level) kernel
shape standalone — head [LN+qkv+dw] and tail [proj+LN+GDFN] fwd and bwd —
and records ok/crash per shape in perf/bisect_block.jsonl, so the model can
route crashing shapes to the older pallas_fused path (or pad them) instead
of disabling the whole tier.

Usage: python tools/bisect_block.py [head|tail|all] [fwd|bwd|all]
"""

import itertools
import json
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

OUT = os.path.join(os.path.dirname(__file__), "..", "perf",
                   "bisect_block.jsonl")

# (C, W, TH-relevant H) per level of the parity model at patch 128, batch 3;
# decoder level1 and the cond blocks reuse these channel counts.
LEVELS = [
    (48, 128, 128),   # level 1
    (96, 64, 64),     # level 2 + decoder L1 (dim 96 at W=128 too, below)
    (96, 128, 128),   # decoder level1 / refinement at full res
    (192, 32, 32),    # level 3 + noise_level2 (192 at W=64)
    (192, 64, 64),    # noise_level2 runs at W=64
    (384, 16, 16),    # latent + noise_level3
]


def emit(rec):
    rec["ts"] = time.strftime("%H:%M:%S")
    if os.environ.get("RCOT_BWD_BF16", "0") not in ("", "0"):
        rec["bwd_bf16"] = os.environ["RCOT_BWD_BF16"]  # keep tier-list value
    for env in ("RCOT_TAIL_VMEM_MB", "RCOT_HEAD_VMEM_MB",
                "RCOT_GRAM_VMEM_MB", "RCOT_FUSED_VMEM_MB"):
        if os.environ.get(env):
            rec[env.removeprefix("RCOT_").lower()] = os.environ[env]
    with open(OUT, "a") as f:
        f.write(json.dumps(rec) + "\n")
    print(json.dumps(rec), flush=True)


def try_compile(tag, fn, *args, grad=False):
    try:
        t0 = time.time()
        if grad:
            f = jax.jit(jax.grad(lambda x, *rest: jnp.sum(
                fn(x, *rest).astype(jnp.float32))))
        else:
            f = jax.jit(fn)
        f.lower(*args).compile()
        emit({"shape": tag, "ok": True, "compile_s": round(time.time() - t0, 1)})
        return True
    except Exception as e:
        emit({"shape": tag, "ok": False, "error": repr(e)[:160]})
        return False


def main():
    if len(sys.argv) > 1 and sys.argv[1] == "gram":
        return gram_sweep()
    from rcot_tpu.ops.pallas_block import block_head, block_tail
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    mode = sys.argv[2] if len(sys.argv) > 2 else "all"
    rng = np.random.default_rng(0)
    b = 3
    for c, w, h in LEVELS:
        x = jnp.asarray(rng.normal(size=(b, h, w, c)), jnp.bfloat16)
        if which in ("head", "all"):
            m = 3 * c
            lw = jnp.ones((c,), jnp.float32)
            lb = jnp.zeros((c,), jnp.float32)
            wq = jnp.asarray(rng.normal(0, .1, (c, m)), jnp.bfloat16)
            dk = jnp.asarray(rng.normal(0, .3, (3, 3, m)), jnp.bfloat16)
            fn = lambda x, lw, lb, wq, dk: block_head(x, lw, lb, wq, dk)  # noqa
            if mode in ("fwd", "all"):
                try_compile(f"head_fwd_c{c}_w{w}", fn, x, lw, lb, wq, dk)
            if mode in ("bwd", "all"):
                try_compile(f"head_bwd_c{c}_w{w}", fn, x, lw, lb, wq, dk,
                            grad=True)
        if which in ("tail", "all"):
            hid = int(c * 2.66)
            a = jnp.asarray(rng.normal(size=(b, h, w, c)), jnp.bfloat16)
            wp = jnp.asarray(rng.normal(0, .1, (c, c)), jnp.bfloat16)
            lw = jnp.ones((c,), jnp.float32)
            lb = jnp.zeros((c,), jnp.float32)
            wi = jnp.asarray(rng.normal(0, .1, (c, 2 * hid)), jnp.bfloat16)
            dk = jnp.asarray(rng.normal(0, .3, (3, 3, 2 * hid)), jnp.bfloat16)
            wo = jnp.asarray(rng.normal(0, .1, (hid, c)), jnp.bfloat16)
            fn = lambda x, a, wp, lw, lb, wi, dk, wo: block_tail(  # noqa
                x, a, wp, lw, lb, wi, dk, wo)
            if mode in ("fwd", "all"):
                try_compile(f"tail_fwd_c{c}_w{w}", fn, x, a, wp, lw, lb, wi,
                            dk, wo)
            if mode in ("bwd", "all"):
                try_compile(f"tail_bwd_c{c}_w{w}", fn, x, a, wp, lw, lb, wi,
                            dk, wo, grad=True)




def gram_sweep():
    """Sweep the pallas_gram kernels (fwd + bwd) per level shape."""
    from rcot_tpu.ops.pallas_gram import mdta_core_gram
    rng = np.random.default_rng(0)
    b = 3
    # every (C, heads) pair the parity model instantiates (incl. the cond
    # blocks' off-pattern head counts: noise_level1 96/4, noise_level3 384/4)
    heads_by_c = {48: (1,), 96: (1, 2, 4), 192: (4,), 384: (4, 8)}
    for c, w, h in LEVELS:
        for heads in heads_by_c[c]:
            qkv = jnp.asarray(rng.normal(size=(b, h, w, 3 * c)), jnp.bfloat16)
            temp = jnp.ones((heads, 1, 1), jnp.float32)
            fn = (lambda hh: lambda t, q: mdta_core_gram(t, q, hh))(heads)
            try_compile(f"gram_fwd_c{c}_w{w}_h{heads}", fn, temp, qkv)
            try_compile(f"gram_bwd_c{c}_w{w}_h{heads}",
                        (lambda hh: lambda q, t: mdta_core_gram(t, q, hh))(heads),
                        qkv, temp, grad=True)


if __name__ == "__main__":
    main()
