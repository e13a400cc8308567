"""Collective-schedule audit: what a sharding config costs in communication.

GSPMD inserts collectives implicitly; on real hardware their cost shows up
in profiles, but at design time (or in a sandbox with no multi-chip
hardware) you want the bill up front. `audit_hlo` parses a compiled
partitioned HLO module for every all-reduce / all-gather / reduce-scatter /
collective-permute / all-to-all and returns kind/count/payload bytes,
classified by mesh axis via replica-group size. bytes / ICI bandwidth is
the analytic lower bound on the communication time a config pays.

Typical use (see tools/collective_audit.py for the full-model CLI):

    hlo = jax.jit(step).lower(*args).compile().as_text()
    report = audit_hlo(hlo, axis_by_group_size={2: "tensor", 4: "data"})

The reference has no analog (single-GPU, no collectives — SURVEY.md §2
parallelism census); this is TPU-native introspection for the mesh axes we
added (data / tensor / spatial, parallel/sharding.py).
"""

import re
from typing import Dict, Optional

_DTYPE_BYTES = {"f64": 8, "f32": 4, "bf16": 2, "f16": 2, "s64": 8, "u64": 8,
                "s32": 4, "u32": 4, "s16": 2, "u16": 2, "s8": 1, "u8": 1,
                "pred": 1}

COLLECTIVE_KINDS = ("all-reduce", "all-gather", "reduce-scatter",
                    "collective-permute", "all-to-all")

# an HLO instruction line: "%name = f32[4,8,8,16]{3,2,1,0} all-gather(..."
# (or a (tuple)-shaped variadic collective, or the -start half of an async
# pair — counting only -start avoids double-counting with -done)
_LINE = re.compile(
    r"=\s*(\([^)]*\)|[a-z0-9]+\[[^\]]*\])\S*\s+(" +
    "|".join(COLLECTIVE_KINDS) + r")((?:-start)?)\(")
_SHAPE = re.compile(r"([a-z0-9]+)\[([0-9,]*)\]")
# replica_groups come in three syntaxes: explicit {{0,1},{2,3}} lists, the
# iota form [n_groups,group_size]<=[total] (optionally transposed), and the
# empty list {} meaning ALL devices; permutes carry source_target_pairs
# instead.
_GROUPS = re.compile(r"replica_groups=\{?\{([0-9,]+)\}")
_GROUPS_IOTA = re.compile(r"replica_groups=\[\d+,(\d+)\]<=\[")
_GROUPS_EMPTY = re.compile(r"replica_groups=\{\}")
_PAIRS = re.compile(r"source_target_pairs=\{\{(\d+),(\d+)\}")


def _group_size(line: str, n_devices: Optional[int] = None) -> Optional[int]:
    m = _GROUPS_IOTA.search(line)
    if m:
        return int(m.group(1))
    m = _GROUPS.search(line)
    if m:
        return len(m.group(1).split(","))
    if _GROUPS_EMPTY.search(line):
        # {} = one group of every device (advisor r3: these were counted
        # but never axis-classified, blinding the 'zero data-axis bytes'
        # assertions to whole-mesh collectives)
        return n_devices
    return None


def shape_bytes(shape_str: str, is_start: bool = False) -> int:
    """Payload bytes of an HLO shape string (tuples sum their components).

    Async `-start` tuples carry (operands..., results..., context tokens):
    counting the whole tuple would double the payload relative to the sync
    form (advisor r3). For those, drop the dimensionless context scalars and
    keep only the result half.
    """
    comps = []
    for dtype, dims in _SHAPE.findall(shape_str):
        if dtype not in _DTYPE_BYTES:
            continue
        n = 1
        for d in dims.split(","):
            if d:
                n *= int(d)
        comps.append((dims, n * _DTYPE_BYTES[dtype]))
    if is_start and len(comps) >= 2:
        data = [b for dims, b in comps if dims != ""]
        if len(data) >= 2 and len(data) % 2 == 0:
            return sum(data[len(data) // 2:])
    return sum(b for _, b in comps)


def audit_hlo(hlo_text: str,
              axis_by_group_size: Optional[Dict[int, str]] = None,
              axis_by_stride: Optional[Dict[int, str]] = None,
              n_devices: Optional[int] = None) -> dict:
    """Count collectives + payload bytes per kind in compiled HLO text.

    Returns {"per_kind": {kind: {count, bytes, by_axis}}, "total": {...}};
    by_axis classifies each collective by its replica-group SIZE through the
    caller's axis_by_group_size map (a 2-wide group on a (data=4, tensor=2)
    mesh is the tensor axis, an 8-wide group spans the whole mesh, ...).
    collective-permute carries source_target_pairs, not groups: those
    classify by the pair STRIDE |target - source| through axis_by_stride
    (on a (data, tensor=2) mesh, stride 1 = tensor, stride 2 = data).
    """
    per_kind: dict = {}
    for line in hlo_text.splitlines():
        m = _LINE.search(line)
        if not m:
            continue
        shape_str, kind, is_start = m.group(1), m.group(2), bool(m.group(3))
        nbytes = shape_bytes(shape_str, is_start)
        rec = per_kind.setdefault(
            kind, {"count": 0, "bytes": 0, "by_axis": {}})
        rec["count"] += 1
        rec["bytes"] += nbytes
        axis = None
        size = _group_size(line, n_devices)
        if size is not None and axis_by_group_size:
            axis = axis_by_group_size.get(size, f"groups-of-{size}")
        else:
            pm = _PAIRS.search(line)
            if pm:
                stride = abs(int(pm.group(2)) - int(pm.group(1)))
                axis = ((axis_by_stride or {}).get(stride)
                        or f"pair-stride-{stride}")
        if axis is not None:
            ax = rec["by_axis"].setdefault(axis, {"count": 0, "bytes": 0})
            ax["count"] += 1
            ax["bytes"] += nbytes
    total = {"count": sum(r["count"] for r in per_kind.values()),
             "bytes": sum(r["bytes"] for r in per_kind.values())}
    return {"per_kind": per_kind, "total": total}
