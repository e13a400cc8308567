"""Kernel dispatch: choose between Pallas fast paths and jnp reference twins.

Env switches:
- RCOT_PALLAS=0|1     force off/on (default: on only on TPU backends)
- RCOT_PALLAS_INTERPRET=1  run Pallas kernels in interpreter mode (tests set
  this so kernels are exercised on the CPU backend)
"""

from __future__ import annotations

import functools
import os


# ------------------------------------------------------- auto-composition
# Trainer-chosen composition defaults (train/trainer.py
# _apply_auto_composition). A separate channel rather than os.environ
# mutation (advisor r4, medium): env writes leaked past the Trainer's
# lifetime into later trainers, validation inference, and subprocesses,
# and made auto-set keys indistinguishable from user-set ones. Resolution
# order everywhere: explicit user env > auto channel > built-in default.
# Inference-scope traces deliberately IGNORE the channel — the auto choice
# exists to dodge a BACKWARD co-compile wall, which no forward-only
# program has (and the inference default is already the measured optimum).
_AUTO: dict = {}


def set_auto(overrides: dict) -> None:
    """Replace the auto-composition overrides (always a full replace, so a
    new Trainer resets any stale previous choice)."""
    _AUTO.clear()
    _AUTO.update(overrides)


def clear_auto() -> None:
    _AUTO.clear()


def auto_overrides() -> dict:
    return dict(_AUTO)


def resolved_env(key: str, default: str = None):
    """os.environ wins; the auto channel fills unset keys (training scope
    only — inference traces see user env or the built-in default)."""
    env = os.environ.get(key)
    if env is not None:
        return env
    if not in_inference_scope() and key in _AUTO:
        return _AUTO[key]
    return default


@functools.lru_cache(maxsize=1)
def pallas_enabled() -> bool:
    env = os.environ.get("RCOT_PALLAS")
    if env is not None:
        return env not in ("0", "false", "")
    try:
        import jax
        return jax.default_backend() not in ("cpu",)
    except Exception:
        return False


def pallas_interpret() -> bool:
    return os.environ.get("RCOT_PALLAS_INTERPRET", "") not in ("", "0")


def dwconv_shifts_on() -> bool:
    """Depthwise 3x3 as shifted FMAs (default OFF): in theory this avoids
    XLA's conv data-formatting copies, but measured on v5e the shift chains
    do NOT fuse (373ms vs 192ms per train iteration) — the conv lowering
    wins despite its formatting copies. RCOT_DWCONV_SHIFTS=1 to experiment."""
    return os.environ.get("RCOT_DWCONV_SHIFTS", "0") not in ("", "0")


def pallas_dwconv_on() -> bool:
    """Fused Pallas depthwise-3x3 kernel (RCOT_PALLAS_DWCONV=1, opt-in until
    measured faster in-model than XLA's conv lowering)."""
    return os.environ.get("RCOT_PALLAS_DWCONV", "") not in ("", "0")


def pallas_fused_on() -> bool:
    """Fused [1x1 -> dw3x3 -> gate -> 1x1] kernel (ops/pallas_fused.py) for
    the GDFN and qkv paths. Default ON on TPU: whole-iteration measurement
    (BENCH.md round 2) shows the dwconv chain costs ~34% of the minimax
    iteration under XLA's lowering and the fused kernel wins in-model.
    RCOT_PALLAS_FUSED=0 to disable."""
    return os.environ.get("RCOT_PALLAS_FUSED", "1") not in ("", "0")


def ablate(part: str) -> bool:
    """Measurement-only ablations (RCOT_ABLATE=dwconv,attn_core,gp): replace a
    component with identity AT TRACE TIME so whole-program profiling can
    attribute iteration cost in-model (isolated microbenchmarks mislead on
    this stack — BENCH.md method note). Never set in training runs."""
    return part in os.environ.get("RCOT_ABLATE", "").split(",")


def pallas_block_on() -> bool:
    """Whole-block fused kernels (ops/pallas_block.py): [LN1+qkv+dw] head and
    [proj+residual+LN2+GDFN+residual] tail — supersede the pallas_fused sites
    when active, folding every per-block elementwise/HBM pass into the two
    kernels. Measured 0.1148 -> 0.1078 s/iter standalone — but ALL THREE
    kernels' backwards in one program (gram + head + tail) crash the remote
    compiler (probe_r2 21:53; band-budget-INDEPENDENT). Dropping the HEAD
    kernel breaks the wall: gram + TAIL-only compiles reliably and is the
    fastest measured composition (0.0992-0.1009 s/iter vs 0.1031 gram+head,
    probe_r2 10:30/10:35) — the default when the gram tier is on. Values:
    RCOT_PALLAS_BLOCK=0 off | head (head kernel, composed tail) | tail
    (fused-qkv + tail kernel, the default with gram) | 1/full (both
    kernels; with gram this crashes today's toolchain)."""
    return block_mode() != "off"


def block_mode() -> str:
    # Forward-only (inference) traces resolve FIRST: they have no backward
    # co-compile wall, so the scope-specific RCOT_INFER_BLOCK outranks even
    # an explicit RCOT_PALLAS_BLOCK here (advisor r4: the more specific
    # explicit setting must win inside the scope it names), and the
    # trainer's auto choice never applies.
    if in_inference_scope():
        ienv = os.environ.get("RCOT_INFER_BLOCK")
        if ienv in ("head", "tail", "full"):
            return ienv
        if ienv in ("0", "off", "false"):
            return "off"
        env = os.environ.get("RCOT_PALLAS_BLOCK")  # user env only, no auto
        if env in ("", "0", "false"):
            return "off"
        if env in ("head", "tail", "1", "full"):
            return "full" if env == "1" else env
        # unset: FULL (head+tail forward kernels). The r4 inference
        # composition matrix settled it — gram+FULL compiles forward-only
        # and wins every measured cell over gram+tail: 256px b1
        # 29.1 vs 27.6 img/s, b8 32.6 vs 30.8; 512px b1 6.58 vs 6.26,
        # b8 7.14 vs 6.83 (perf/probe_r4.jsonl 08:35-09:41, +4.5-5.8%).
        return "full"
    env = resolved_env("RCOT_PALLAS_BLOCK")
    if env in ("", "0", "false"):
        return "off"
    if env in ("head", "tail"):
        # "tail": tail kernel only, fused-tier qkv + composed head — the
        # fastest gram-co-compilable composition (fewer kernels per
        # program than "full", which crashes with gram)
        return env
    if env in ("1", "full"):
        # explicit force — including head+tail+gram in one program, which
        # crashes today's toolchain unless RCOT_PALLAS_GRAM=0 (the
        # batch-8-class program shape is the exception, BENCH.md round 4)
        return "full"
    # unset or unrecognized: resolve against the gram tier (gram + head +
    # tail backwards cannot all share a program on the current toolchain;
    # gram+tail can, and wins: 0.0992 vs 0.1031 s/iter).
    return "tail" if pallas_gram_on() else "full"


_INFER_SCOPE_DEPTH = 0


class inference_scope:
    """Trace-time marker for forward-only programs (no backward will be
    taken through the traced ops): lets block_mode() resolve kernel
    compositions that cannot co-compile with their backwards but are fine
    (and potentially faster) forward-only. Entered by make_restorer's
    apply fn, so it is active exactly while jit traces the inference
    program. Not thread-safe across concurrent tracers (fine here: one
    restorer trace at a time)."""

    def __enter__(self):
        global _INFER_SCOPE_DEPTH
        _INFER_SCOPE_DEPTH += 1
        return self

    def __exit__(self, *exc):
        global _INFER_SCOPE_DEPTH
        _INFER_SCOPE_DEPTH -= 1
        return False


def in_inference_scope() -> bool:
    return _INFER_SCOPE_DEPTH > 0


def pallas_gram_on() -> bool:
    """Transpose-free MDTA core (ops/pallas_gram.py): Gram/norm accumulation
    + apply kernels on NHWC qkv — removes the (3,B,heads,ch,HW) relayouts
    (~13 ms/iter measured, probe_r2 attn_all vs attn_core ablations).
    Default ON on TPU: 0.1148 -> 0.1061 s/iter composed with the
    pallas_fused tier (probe_r2 22:05). Its backward co-compiles with the
    block-TAIL backward (the default composition) but NOT with head+tail
    together on the current toolchain (see block_mode).
    RCOT_PALLAS_GRAM=0 disables."""
    return os.environ.get("RCOT_PALLAS_GRAM", "1") not in ("", "0")


def gram_combined_on() -> bool:
    """Combined single-VJP gram backward (apply-bwd emits only dv, gram-bwd
    only [dq|dk], one concatenate) vs the split per-op VJP structure
    (RCOT_GRAM_COMBINED=0 — the escape hatch if the combined program shape
    trips the remote compile helper; ops/pallas_gram.py). The ONE reader —
    bench._composition and mdta_core_gram both resolve through here."""
    return os.environ.get("RCOT_GRAM_COMBINED", "1") not in ("", "0")


def tail_split_on() -> bool:
    """Split the block-TAIL backward into two slimmer Mosaic kernels
    (RCOT_TAIL_SPLIT=1, opt-in until measured): a dx/da kernel (drops the 6
    grid-revisited weight-grad accumulators) and a dW kernel (drops the
    dx/da row streams), each recomputing the shared band intermediates.
    Probes VERDICT r2 #3: whether the monolith's ~20-25% MXU utilization is
    per-kernel complexity (slimmer programs -> deeper bands pipelined under
    the compile-helper wall, band knobs RCOT_TAIL_DX/DW_VMEM_MB) or
    fundamental. Trace-time toggle, like every RCOT_* flag."""
    return os.environ.get("RCOT_TAIL_SPLIT", "") not in ("", "0")


def any_ablate() -> bool:
    return bool(os.environ.get("RCOT_ABLATE"))


def pallas_mdta_on() -> bool:
    """The fused MDTA kernel is opt-in (RCOT_PALLAS_MDTA=1): measured on v5e
    it wins only for small-N many-head shapes and loses at level-1 sizes."""
    return os.environ.get("RCOT_PALLAS_MDTA", "") not in ("", "0")
