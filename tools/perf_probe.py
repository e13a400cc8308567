"""Round-2 TPU perf probe: dissect the minimax iteration per config/phase.

Measures, on the real chip, any of (argv selects; results append as JSONL):
  iter_<cfg>     full minimax iteration (f_step + t_step, one jit, donated)
  loop_<cfg>     10 iterations inside ONE jit (lax.fori_loop) — removes host
                 dispatch/tunnel latency from the measurement
  tfwd_<cfg>     T_net two-pass forward only
  tstep_<cfg>    t_step only (two-pass fwd + OT loss bwd + update)
  fstep_<cfg>    f_step only (critic WGAN + GP double update)
  infer_<cfg>    256px whole-image two-pass inference

<cfg> is one of: parity | turbo (dim 48, ffn hidden rounded to 128) |
turbo64 (dim 64, same rounding — the VERDICT's suggested shape).

Usage (detached — compiles take 5-15 min each on the axon remote compiler):
  nohup python -u tools/perf_probe.py iter_parity iter_turbo ... \
      >> perf/probe_r2.log 2>&1 &
Results: perf/probe_r2.jsonl, one JSON object per measurement.
"""

import dataclasses
import json
import os
import sys
import time

# script-mode python puts tools/ (not the repo root) on sys.path; make the
# probe runnable as `python tools/perf_probe.py` without an installed package
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

OUT = os.path.join(os.path.dirname(__file__), "..", "perf",
                   os.environ.get("RCOT_PROBE_OUT", "probe_r3.jsonl"))


def emit(rec):
    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    rec["ts"] = time.strftime("%H:%M:%S")
    if os.environ.get("RCOT_PROBE_CELL"):
        rec["cell"] = os.environ["RCOT_PROBE_CELL"]  # queue relaunch idempotency
    if os.environ.get("RCOT_ABLATE"):
        rec["ablate"] = os.environ["RCOT_ABLATE"]
    from rcot_tpu.ops import dispatch
    rec["fused"] = bool(dispatch.pallas_enabled() and dispatch.pallas_fused_on())
    if dispatch.pallas_enabled() and dispatch.pallas_block_on():
        rec["block"] = dispatch.block_mode()
    if dispatch.pallas_enabled() and dispatch.pallas_gram_on():
        rec["gram"] = "combined" if dispatch.gram_combined_on() else "split"
    for env in ("RCOT_TAIL_VMEM_MB", "RCOT_HEAD_VMEM_MB", "RCOT_GRAM_VMEM_MB"):
        if os.environ.get(env):
            rec[env.removeprefix("RCOT_").lower()] = os.environ[env]
    if os.environ.get("RCOT_BWD_BF16", "0") not in ("", "0"):
        rec["bwd_bf16"] = os.environ["RCOT_BWD_BF16"]  # keep tier-list value
    if os.environ.get("RCOT_SINGLE_FWD"):
        rec["single_fwd"] = os.environ["RCOT_SINGLE_FWD"]
    for env in ("RCOT_INFER_RES", "RCOT_INFER_BATCH"):
        if os.environ.get(env):
            rec[env.removeprefix("RCOT_").lower()] = int(os.environ[env])
    if os.environ.get("RCOT_SCAN_BLOCKS", "") not in ("", "0"):
        rec["scan_blocks"] = os.environ.get("RCOT_SCAN_MIN_BLOCKS", True)
    if os.environ.get("RCOT_REMAT", "") not in ("", "0"):
        rec["remat"] = True
    if dispatch.tail_split_on():
        rec["tail_split"] = True
        for env in ("RCOT_TAIL_DX_VMEM_MB", "RCOT_TAIL_DW_VMEM_MB"):
            if os.environ.get(env):
                rec[env.removeprefix("RCOT_").lower()] = os.environ[env]
    with open(OUT, "a") as f:
        f.write(json.dumps(rec) + "\n")
    print(json.dumps(rec), flush=True)


def get_cfg(name):
    from rcot_tpu.utils.config import get_preset
    cfg = get_preset("derain")
    if name == "turbo":
        cfg = get_preset("derain_turbo")
    elif name == "turbo64":
        from rcot_tpu.utils.config import ModelConfig
        cfg = dataclasses.replace(
            get_preset("derain_turbo"),
            model=ModelConfig(dim=64, ffn_hidden_multiple=128,
                              parity_params=False))
    elif name != "parity":
        raise SystemExit(f"unknown cfg {name}")
    cfg = cfg.replace(train=dataclasses.replace(cfg.train, dtype="bfloat16"))
    bs = int(os.environ.get("RCOT_PROBE_BATCH", "0"))
    if bs:
        cfg = cfg.replace(train=dataclasses.replace(cfg.train, batch_size=bs))
    return cfg


def make_inputs(cfg):
    # fresh state per task: iter/loop tasks donate (and thus delete) it
    from rcot_tpu.train.steps import Batch, create_train_state
    state = create_train_state(jax.random.PRNGKey(0), cfg)
    jax.block_until_ready(state)
    bs, ps = cfg.train.batch_size, cfg.data.patch_size
    dt = jnp.bfloat16 if cfg.train.dtype == "bfloat16" else jnp.float32
    rng = np.random.default_rng(0)
    batch = Batch(
        degraded=jnp.asarray(rng.uniform(size=(bs, ps, ps, 3)), dt),
        target=jnp.asarray(rng.uniform(size=(bs, ps, ps, 3)), dt),
        de_id=jnp.asarray(np.full((bs,), 3, np.int32)))
    return state, batch, jax.random.PRNGKey(1), jnp.array(True), jnp.float32(1e-4)


def timeit(compiled, args, n=10, warmup=3, donate_state=False):
    state = args[0]
    for _ in range(warmup):
        out = compiled(state, *args[1:])
        state = out[0] if donate_state else state
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = compiled(state, *args[1:])
        state = out[0] if donate_state else state
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n, out


def validate_out(out):
    """True iff every leaf of the timed program's final output is finite.

    The b10_bf16 probe row (2026-08-20 07:25) recorded 0.00829 s/iter =
    97.6 TFLOP/s — ~27x the best-ever rate on this chip — because nothing
    ever looked at what the 'fast' program produced. A degenerate remote
    compile or a silently-failed execution must flag the row, not poison
    the record."""
    try:
        leaves = jax.tree_util.tree_leaves(out)
        return all(bool(jnp.isfinite(x).all()) for x in leaves
                   if hasattr(x, "dtype") and jnp.issubdtype(x.dtype,
                                                             jnp.inexact))
    except Exception:
        return False


def flops_of(lowered_compiled):
    try:
        cost = lowered_compiled.cost_analysis()
        if isinstance(cost, list):
            cost = cost[0]
        return float(cost.get("flops", 0.0)) or None
    except Exception:
        return None


def run(task):
    kind, cname = task.split("_", 1)
    cfg = get_cfg(cname)
    from rcot_tpu.train.steps import (make_f_step, make_t_step,
                                      make_train_iteration)
    state, batch, key, paired, lr = make_inputs(cfg)
    bs = cfg.train.batch_size
    t_compile0 = time.perf_counter()

    if kind == "iter":
        fn = jax.jit(make_train_iteration(cfg), donate_argnums=(0,))
        c = fn.lower(state, batch, key, paired, lr).compile()
        fl = flops_of(c)
        dt, out = timeit(c, (state, batch, key, paired, lr),
                         donate_state=True)
    elif kind == "loop":
        iteration = make_train_iteration(cfg)
        K = 10

        def loop(state, batch, key, paired, lr):
            def body(i, s):
                s, _ = iteration(s, batch, jax.random.fold_in(key, i),
                                 paired, lr)
                return s
            return jax.lax.fori_loop(0, K, body, state)

        fn = jax.jit(loop, donate_argnums=(0,))
        c = fn.lower(state, batch, key, paired, lr).compile()
        fl = flops_of(c)
        dt, out = timeit(c, (state, batch, key, paired, lr), n=3,
                         donate_state=False)
        dt /= K
        if fl:
            fl /= K
    elif kind == "tstep":
        fn = jax.jit(make_t_step(cfg), donate_argnums=(0,))
        c = fn.lower(state, batch, paired, lr).compile()
        fl = flops_of(c)
        dt, out = timeit(c, (state, batch, paired, lr), donate_state=True)
    elif kind == "fstep":
        fn = jax.jit(make_f_step(cfg), donate_argnums=(0,))
        c = fn.lower(state, batch, key, lr).compile()
        fl = flops_of(c)
        dt, out = timeit(c, (state, batch, key, lr), donate_state=True)
    elif kind == "tfwd":
        from rcot_tpu.models.restormer import apply_tnet
        fn = jax.jit(lambda p, x: apply_tnet(p, x, cfg.model)[0])
        c = fn.lower(state.t_params, batch.degraded).compile()
        fl = flops_of(c)
        dt, out = timeit(c, (state.t_params, batch.degraded))
    elif kind == "infer":
        # res/batch via RCOT_INFER_RES / RCOT_INFER_BATCH (VERDICT r3 #3:
        # the inference composition space — forward-only programs have no
        # backward co-compile wall, so gram+FULL may be free speed)
        from rcot_tpu.models.restormer import apply_tnet
        res = int(os.environ.get("RCOT_INFER_RES", "256"))
        bs = int(os.environ.get("RCOT_INFER_BATCH", "1"))
        x = jnp.zeros((bs, res, res, 3), jnp.bfloat16)
        fn = jax.jit(lambda p, x: apply_tnet(p, x, cfg.model)[0])
        c = fn.lower(state.t_params, x).compile()
        fl = flops_of(c)
        dt, out = timeit(c, (state.t_params, x))
    else:
        raise SystemExit(f"unknown kind {kind}")

    finite = validate_out(out)
    tflops = round(fl / dt / 1e12, 2) if fl else None
    rec = {"task": task, "sec": round(dt, 5), "batch": bs,
           "per_sec": round(bs / dt, 3), "flops": fl, "tflops": tflops,
           "compile_s": round(time.perf_counter() - t_compile0 - 13 * dt, 1)}
    if not finite:
        rec["out_finite"] = False
    # no measured composition has ever exceeded ~13 TFLOP/s on this chip;
    # a rate past 30 means the timed program did not do the work
    if not finite or (tflops is not None and tflops > 30):
        rec["suspect"] = True
    emit(rec)


def main():
    from rcot_tpu.utils.compilation_cache import enable_compilation_cache
    enable_compilation_cache()
    emit({"task": "start", "device": str(jax.devices()[0]),
          "argv": sys.argv[1:]})
    for task in sys.argv[1:]:
        try:
            run(task)
        except Exception as e:  # keep going; record the failure
            emit({"task": task, "error": repr(e)[:500]})


if __name__ == "__main__":
    main()
