"""rcot-eval: unified multi-task evaluation over the test datasets.

The reference evaluates each task by hand-running tester.py per folder; its
AirNet-heritage test dataset classes (util/dataset_utils.py:290-521) were the
building blocks of a unified harness it never shipped. This CLI is that
harness: one checkpoint, many tasks, per-task PSNR/SSIM (+optional noise
sigmas for denoise), one JSON summary.

Hardened after the round-3 phase-4 loss (perf/r3_phase4.log: the derain GT
folder was mis-named, the task crashed mid-generator, and the denoise rows
already computed evaporated because the summary was only written at the end):
- every task's folders AND every derived GT path are validated UP FRONT
  (the trainer's fail-fast pattern, train/trainer.py fit());
- each task runs isolated — a failing task records {"error": ...} and the
  remaining tasks still run;
- the summary JSON is (re)written after EVERY task, so partial results
  survive any later crash;
- per-item failures (unreadable file, degraded/target shape mismatch) are
  skipped LOUDLY — logged with the reason and counted in the task row;
- each task row carries the input baseline (degraded-vs-target PSNR/SSIM),
  so "the model beats identity" is machine-checkable from the JSON alone.

  python -m rcot_tpu.cli.eval_all --ckpt ckpt.npz \
      --denoise-path data/test/BSD68/ --sigmas 15 25 50 \
      --derain-path data/test/Rain100L/ --dehaze-path data/test/SOTS/ \
      --deblur-dir data/test/GoPro/ --lowlight-dir data/test/LOL/
"""

from __future__ import annotations

import argparse
import json
import sys


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="rcot-tpu unified evaluation")
    p.add_argument("--ckpt", required=True)
    p.add_argument("--denoise-path", default=None,
                   help="clean image folder (noise synthesized per --sigmas)")
    p.add_argument("--sigmas", type=float, nargs="+", default=[15, 25, 50])
    p.add_argument("--derain-path", default=None, help="folder with input/ + target/")
    p.add_argument("--dehaze-path", default=None, help="folder with input/ + target/")
    p.add_argument("--deblur-dir", default=None, help="GoPro-style root (test/blur, test/sharp)")
    p.add_argument("--lowlight-dir", default=None, help="LOL-style root (low/, high/)")
    p.add_argument("--paired", nargs=2, action="append", default=[],
                   metavar=("NAME", "DIR"),
                   help="extra task: DIR/input + DIR/target paired by sorted "
                        "order (tester.py:55-58 semantics); repeatable")
    p.add_argument("--tile", type=int, default=0)
    p.add_argument("--tile-overlap", type=int, default=32)
    p.add_argument("--dtype", choices=["float32", "bfloat16"], default="float32")
    p.add_argument("--json-out", default=None, help="write the summary JSON here too")
    return p


def _eval_items(restorer, items, psnr_fn, ssim_fn, task: str):
    """Evaluate one task; skips are loud (logged + counted), never silent."""
    import jax.numpy as jnp

    from ..metrics.quality import AverageMeter
    pm, sm = AverageMeter(), AverageMeter()
    ipm, ism = AverageMeter(), AverageMeter()  # input (identity) baseline
    skipped = 0
    for name, deg, clean in items:
        if deg.shape != clean.shape:
            skipped += 1
            print(f"eval_skip task={task} item={name} reason=shape_mismatch "
                  f"deg={deg.shape} target={clean.shape}", flush=True)
            continue
        try:
            out = restorer(deg)
        except Exception as e:
            skipped += 1
            print(f"eval_skip task={task} item={name} "
                  f"reason={type(e).__name__}: {e}", flush=True)
            continue
        clean_j = jnp.asarray(clean)
        pm.update(float(psnr_fn(jnp.asarray(out), clean_j)))
        sm.update(float(ssim_fn(jnp.asarray(out) * 255.0, clean_j * 255.0)))
        ipm.update(float(psnr_fn(jnp.asarray(deg), clean_j)))
        ism.update(float(ssim_fn(jnp.asarray(deg) * 255.0, clean_j * 255.0)))
    row = {"psnr": round(pm.avg, 4), "ssim": round(sm.avg, 5), "n": pm.count,
           "input_psnr": round(ipm.avg, 4), "input_ssim": round(ism.avg, 5)}
    if skipped:
        row["skipped"] = skipped
    return row


def _validate_paired(ds) -> None:
    """Fail fast (with EVERY missing path, not just the first) before any
    compute: the GT-path rules (reference util/dataset_utils.py:383-397) are
    derivation rules, so a mis-built tree must surface as one clear error."""
    import os
    if not ds.ids:
        raise FileNotFoundError(f"no input images for task {ds.task!r}")
    missing = [gt for gt in (ds._gt_path(p) for p in ds.ids)
               if not os.path.isfile(gt)]
    if missing:
        head = ", ".join(missing[:3])
        raise FileNotFoundError(
            f"{len(missing)}/{len(ds.ids)} derived GT paths missing for "
            f"task {ds.task!r} (first: {head})")


def _write_summary(args, results) -> str:
    summary = json.dumps({"ckpt": args.ckpt, "results": results}, indent=2)
    if args.json_out:
        with open(args.json_out, "w") as f:
            f.write(summary)
    return summary


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)

    import jax.numpy as jnp

    from ..data.eval_datasets import (DeblurTestDataset, DenoiseTestDataset,
                                      DerainDehazeDataset, LowLightTestDataset)
    from ..metrics.quality import psnr, ssim_ref_single
    from ..models.inference import make_restorer
    from ..utils.compilation_cache import enable_compilation_cache
    from ..utils.config import ModelConfig
    from .test import load_t_params

    enable_compilation_cache()
    params, model_cfg, backbone = load_t_params(args.ckpt, ModelConfig())
    restorer = make_restorer(
        params, model_cfg, tile=args.tile, tile_overlap=args.tile_overlap,
        dtype=jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32,
        backbone=backbone)

    # (key, build) pairs; build() -> item iterable, validating up front
    tasks = []
    if args.denoise_path:
        for sigma in args.sigmas:
            # :g keeps fractional sigmas distinct (int() made 15.2 and 15.8
            # collide on the same key and silently overwrite each other).
            # Dataset construction happens INSIDE build() so a bad folder is
            # a per-task error, not a whole-CLI crash.
            def build(sigma=sigma):
                ds = DenoiseTestDataset(args.denoise_path, sigma=sigma)
                if not len(ds):
                    raise FileNotFoundError(
                        f"no images in {args.denoise_path!r}")
                return (ds[i] for i in range(len(ds)))
            tasks.append((f"denoise_sigma{sigma:g}", build))
    for task, path in (("derain", args.derain_path),
                       ("dehaze", args.dehaze_path)):
        if not path:
            continue

        def build(task=task, path=path):
            ds = DerainDehazeDataset(
                args.derain_path or "", args.dehaze_path or "", task=task)
            _validate_paired(ds)
            return (ds[i] for i in range(len(ds)))
        tasks.append((task, build))
    if args.deblur_dir:
        def build(path=args.deblur_dir):
            ds = DeblurTestDataset(path)
            return (ds[i] for i in range(len(ds)))
        tasks.append(("deblur", build))
    if args.lowlight_dir:
        def build(path=args.lowlight_dir):
            ds = LowLightTestDataset(path)
            return (ds[i] for i in range(len(ds)))
        tasks.append(("lowlight", build))
    for name, root in args.paired:
        def build(root=root):
            import os

            import numpy as np

            from ..data.datasets import crop_to_base, eval_pairs, load_rgb
            pairs = eval_pairs(os.path.join(root, "input/"),
                               os.path.join(root, "target/"))
            if not pairs:
                raise FileNotFoundError(
                    f"no input/target pairs under {root!r}")
            def items():
                for deg_p, tar_p in pairs:
                    deg = crop_to_base(load_rgb(deg_p), 16)
                    tar = crop_to_base(load_rgb(tar_p), 16)
                    yield (os.path.basename(deg_p)[:-4],
                           deg.astype(np.float32) / 255.0,
                           tar.astype(np.float32) / 255.0)
            return items()
        tasks.append((name, build))

    results = {}
    failed = 0
    for key, build in tasks:
        try:
            items = build()
            results[key] = _eval_items(restorer, items, psnr,
                                       ssim_ref_single, key)
        except Exception as e:
            failed += 1
            results[key] = {"error": f"{type(e).__name__}: {e}"}
            print(f"task {key} FAILED: {results[key]['error']}",
                  file=sys.stderr, flush=True)
        else:
            print(f"{key}: {results[key]}", flush=True)
        _write_summary(args, results)  # partial results survive a crash

    print(_write_summary(args, results))
    return 1 if failed else 0


if __name__ == "__main__":
    sys.exit(main())
