"""Render a probe JSONL (tools/perf_probe.py output) as a markdown table.

Groups iter_* rows (training compositions) and infer_* rows (forward-only)
separately; multiple runs of the same cell label collapse into min/mean.
Used to fold perf/probe_r4.jsonl into BENCH.md without hand-transcription.

Usage: python tools/probe_summary.py [perf/probe_r4.jsonl]
"""

import json
import sys
from collections import defaultdict


def fmt_cfg(d):
    parts = []
    if d.get("block"):
        parts.append(f"block={d['block']}")
    if d.get("gram"):
        parts.append(f"gram={d['gram']}")
    if d.get("bwd_bf16"):
        parts.append("bwd-bf16")
    if d.get("remat"):
        parts.append("remat")
    for k in ("tail_vmem_mb", "head_vmem_mb", "gram_vmem_mb"):
        if d.get(k):
            parts.append(f"{k.split('_')[0]}-band={d[k]}MB")
    return " ".join(parts) or "XLA-only"


def main():
    path = sys.argv[1] if len(sys.argv) > 1 else "perf/probe_r4.jsonl"
    train = defaultdict(list)   # (batch, cfg) -> [sec]
    infer = defaultdict(list)   # (res, batch, cfg) -> [sec]
    fails = []
    suspects = []
    for line in open(path):
        try:
            d = json.loads(line)
        except ValueError:
            continue
        task = d.get("task", "")
        if task == "start":
            continue
        if "error" in d or d.get("rc"):
            fails.append(d)
            continue
        if d.get("suspect") or (d.get("tflops") or 0) > 30 or d.get("out_finite") is False:
            # rate-validation flag from perf_probe (implausible TFLOP/s or
            # non-finite outputs) — re-derived here too for rows that
            # predate the flag: never fold into the measurement tables
            suspects.append(d)
            continue
        if task.startswith("iter") and "sec" in d:
            train[(d.get("batch"), fmt_cfg(d))].append(d["sec"])
        elif task.startswith("infer") and "sec" in d:
            infer[(d.get("infer_res", 256), d.get("batch"),
                   fmt_cfg(d))].append(d["sec"])

    if train:
        print("| batch | composition | s/iter (min) | mean | n | patches/s |")
        print("|---|---|---|---|---|---|")
        for (b, cfg), secs in sorted(train.items()):
            lo, mu = min(secs), sum(secs) / len(secs)
            print(f"| {b} | {cfg} | {lo:.4f} | {mu:.4f} | {len(secs)} "
                  f"| {b / lo:.2f} |")
    if infer:
        print()
        print("| res | batch | composition | s/call (min) | img/s | n |")
        print("|---|---|---|---|---|---|")
        for (r, b, cfg), secs in sorted(infer.items()):
            lo = min(secs)
            print(f"| {r} | {b} | {cfg} | {lo:.4f} | {b / lo:.2f} "
                  f"| {len(secs)} |")
    if suspects:
        print()
        print("SUSPECT cells (failed perf_probe's output/rate validation; "
              "excluded from the tables above):")
        for d in suspects:
            print(f"  - {d.get('cell', d.get('task'))}: sec={d.get('sec')} "
                  f"tflops={d.get('tflops')} out_finite={d.get('out_finite', True)}")
    if fails:
        print()
        print("failed cells:")
        for d in fails:
            print(f"  - {d.get('cell', d.get('task'))}: "
                  f"{d.get('error', '')[:120]}")


if __name__ == "__main__":
    main()
