"""Host input-pipeline throughput A/B: PIL vs the native C++ patchloader.

The train loop's residual stall on this 1-core host is image decode
(STATUS #22); native/patchloader.cc exists precisely to fix it. This probe
measures the HOST side alone (no device): batches/sec and patches/sec the
loader can sustain over a real synthetic tree, both paths, plus a content
identity check (the native path must produce bit-identical batches).

Usage:
  python tools/loader_bench.py --root /tmp/rcot_allinone [--batches 80]
                               [--batch-size 3] [--patch 128]
Appends a JSON line per path to perf/loader_bench.jsonl.
"""

from __future__ import annotations

import argparse
import json
import os
import time

import numpy as np


def run(use_native: bool, cfg, n_batches: int) -> dict:
    from rcot_tpu.data.pipeline import TrainLoader

    if use_native:
        # TrainLoader(use_native=True) sets .native unconditionally; the
        # real readiness signal is available() — without this check an
        # unbuilt library surfaced as a RuntimeError mid-iteration
        # (advisor r3)
        from rcot_tpu.data import native
        assert native.available(), "native loader unavailable (unbuilt)"
    loader = TrainLoader(cfg, seed=0, use_native=use_native)
    it = loader.epoch(1)
    # warmup: first batch pays index/open-file costs
    first = next(it)
    t0 = time.perf_counter()
    n = 0
    for b in it:
        n += 1
        if n >= n_batches:
            break
    dt = time.perf_counter() - t0
    bs = cfg.train.batch_size
    return {
        "native": use_native,
        "batches": n,
        "batch_size": bs,
        "patch": cfg.data.patch_size,
        "sec_per_batch": dt / n,
        "patches_per_sec": n * bs / dt,
        "first_batch_checksum": float(np.float64(first.degraded).sum()
                                      + np.float64(first.clean).sum()),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", default="/tmp/rcot_allinone")
    ap.add_argument("--batches", type=int, default=80)
    ap.add_argument("--batch-size", type=int, default=3)
    ap.add_argument("--patch", type=int, default=128)
    args = ap.parse_args()

    import dataclasses

    from rcot_tpu.utils.config import get_preset

    cfg = get_preset("all_in_one")
    r = args.root
    cfg = dataclasses.replace(
        cfg,
        data=dataclasses.replace(
            cfg.data, patch_size=args.patch,
            denoise_dir=f"{r}/Denoise/", derain_dir=f"{r}/Derain/",
            dehaze_dir=f"{r}/Dehaze/", data_file_dir=f"{r}/manifests/"),
        train=dataclasses.replace(cfg.train, batch_size=args.batch_size),
    )

    results = [run(False, cfg, args.batches), run(True, cfg, args.batches)]
    assert results[0]["first_batch_checksum"] == results[1]["first_batch_checksum"], \
        "native batch diverged from PIL batch"

    os.makedirs("perf", exist_ok=True)
    with open("perf/loader_bench.jsonl", "a") as f:
        for rec in results:
            rec["time"] = time.time()
            f.write(json.dumps(rec) + "\n")
            name = "native" if rec["native"] else "pil"
            print(f"{name:>6}: {rec['sec_per_batch']*1e3:8.2f} ms/batch "
                  f"{rec['patches_per_sec']:8.1f} patches/s")
    speedup = results[0]["sec_per_batch"] / results[1]["sec_per_batch"]
    print(f"native speedup: {speedup:.2f}x")


if __name__ == "__main__":
    main()
