"""Bisect the bench.py canonical-b3 vs perf_probe b3 disagreement.

VERDICT r4 weak #2: BENCH_r04.json's detail.canonical_batch3 measured
0.1582 s/iter while the same-day probe's b3 gram+TAIL fp32 cell measured
0.0953 — nominally the identical program (derain parity preset, bf16
activations, batch 3, shipped composition), 66% apart. The difference in
CONTEXT: the bench times its b3 leg in a process that has already
compiled+run the batch-8 headline leg (gram+FULL+bf16) and still holds its
state/batch/executable; the probe runs b3 alone in a fresh process.

Each MODE below runs in its OWN process (the queue launches them
separately) and appends one JSONL row per timed leg to perf/probe_r5.jsonl:

  b3_only       compile+time the b3 program alone — must reproduce the
                probe's ~0.095 s/iter (sanity anchor)
  b8_b3         replicate bench.py's exact sequence: b8 headline leg
                (env-scoped gram+FULL+bf16) then the b3 leg, b8 residents
                kept alive — must reproduce the bench's ~0.158 if the
                sequence is the cause
  b8_b3_freed   same, but delete every b8-leg device reference (state,
                batch, step executable) before compiling/timing b3 —
                isolates HBM/executable residency
  b3_b8         order swap: b3 first (fresh-process context), then b8 —
                shows whether the SECOND leg is always the slow one

Usage:  python tools/bench_recon.py <mode>
"""

import gc
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

OUT = os.path.join(os.path.dirname(__file__), "..", "perf",
                   os.environ.get("RCOT_PROBE_OUT", "probe_r5.jsonl"))


def emit(rec):
    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    rec["ts"] = time.strftime("%H:%M:%S")
    if os.environ.get("RCOT_PROBE_CELL"):
        rec["cell"] = os.environ["RCOT_PROBE_CELL"]
    with open(OUT, "a") as f:
        f.write(json.dumps(rec) + "\n")
    print(json.dumps(rec), flush=True)


def make_leg(bs):
    """Build (state, batch, aux args) exactly as bench.py main() does."""
    import dataclasses

    from rcot_tpu.train.steps import Batch, create_train_state
    from rcot_tpu.utils.config import get_preset
    cfg = get_preset("derain")
    cfg = cfg.replace(train=dataclasses.replace(
        cfg.train, batch_size=bs, dtype="bfloat16"))
    state = create_train_state(jax.random.PRNGKey(0), cfg)
    jax.block_until_ready(state)
    ps = cfg.data.patch_size
    rng = np.random.default_rng(0)
    batch = Batch(
        degraded=jnp.asarray(rng.uniform(size=(bs, ps, ps, 3)), jnp.bfloat16),
        target=jnp.asarray(rng.uniform(size=(bs, ps, ps, 3)), jnp.bfloat16),
        de_id=jnp.asarray(np.full((bs,), 3, np.int32)))
    return cfg, state, batch


def compile_leg(cfg, state, batch, key, paired, lr):
    from rcot_tpu.train.steps import make_train_iteration
    return jax.jit(make_train_iteration(cfg), donate_argnums=(0,)).lower(
        state, batch, key, paired, lr).compile()


def time_leg(step, state, batch, key, paired, lr, n=10, warmup=3):
    for _ in range(warmup):
        state, metrics = step(state, batch, key, paired, lr)
    jax.block_until_ready(state)
    t0 = time.perf_counter()
    for _ in range(n):
        state, metrics = step(state, batch, key, paired, lr)
    jax.block_until_ready(state)
    dt = (time.perf_counter() - t0) / n
    finite = all(bool(jnp.isfinite(x).all())
                 for x in jax.tree_util.tree_leaves(metrics)
                 if hasattr(x, "dtype") and jnp.issubdtype(x.dtype,
                                                           jnp.inexact))
    return dt, state, finite


class env_scope:
    def __init__(self, overrides):
        self.overrides, self.saved = overrides, {}

    def __enter__(self):
        for k, v in self.overrides.items():
            self.saved[k] = os.environ.get(k)
            os.environ[k] = v

    def __exit__(self, *exc):
        for k, old in self.saved.items():
            os.environ.pop(k, None) if old is None else os.environ.__setitem__(k, old)
        return False


def run_b8(tag):
    cfg, state, batch = make_leg(8)
    key, paired, lr = jax.random.PRNGKey(1), jnp.array(True), jnp.float32(1e-4)
    with env_scope({"RCOT_PALLAS_BLOCK": "full", "RCOT_BWD_BF16": "all"}):
        t0 = time.perf_counter()
        step = compile_leg(cfg, state, batch, key, paired, lr)
        compile_s = time.perf_counter() - t0
    dt, state, finite = time_leg(step, state, batch, key, paired, lr)
    emit({"task": f"recon_{tag}_b8", "sec": round(dt, 5), "batch": 8,
          "per_sec": round(8 / dt, 3), "compile_s": round(compile_s, 1),
          "out_finite": finite, "composition": "gram+FULL+bf16"})
    return state, batch, step


def run_b3(tag):
    cfg, state, batch = make_leg(3)
    key, paired, lr = jax.random.PRNGKey(1), jnp.array(True), jnp.float32(1e-4)
    t0 = time.perf_counter()
    step = compile_leg(cfg, state, batch, key, paired, lr)
    compile_s = time.perf_counter() - t0
    dt, state, finite = time_leg(step, state, batch, key, paired, lr)
    emit({"task": f"recon_{tag}_b3", "sec": round(dt, 5), "batch": 3,
          "per_sec": round(3 / dt, 3), "compile_s": round(compile_s, 1),
          "out_finite": finite, "composition": "shipped (gram+TAIL fp32)"})
    return state, batch, step


def main():
    mode = sys.argv[1]
    from rcot_tpu.utils.compilation_cache import enable_compilation_cache
    enable_compilation_cache()
    emit({"task": f"recon_start_{mode}", "device": str(jax.devices()[0])})
    if mode == "b3_only":
        run_b3(mode)
    elif mode == "b8_b3":
        residents = run_b8(mode)  # keep b8 state/batch/executable alive
        run_b3(mode)
        del residents
    elif mode == "b8_b3_freed":
        state8, batch8, step8 = run_b8(mode)
        del state8, batch8, step8
        gc.collect()
        run_b3(mode)
    elif mode == "b3_b8":
        residents = run_b3(mode)
        run_b8(mode)
        del residents
    else:
        raise SystemExit(f"unknown mode {mode}")


if __name__ == "__main__":
    main()
