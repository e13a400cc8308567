"""rcot-eval: unified multi-task evaluation over the test datasets.

The reference evaluates each task by hand-running tester.py per folder; its
AirNet-heritage test dataset classes (util/dataset_utils.py:290-521) were the
building blocks of a unified harness it never shipped. This CLI is that
harness: one checkpoint, many tasks, per-task PSNR/SSIM (+optional noise
sigmas for denoise), one JSON summary.

  python -m rcot_tpu.cli.eval_all --ckpt ckpt.npz \
      --denoise-path data/test/BSD68/ --sigmas 15 25 50 \
      --derain-path data/test/Rain100L/ --dehaze-path data/test/SOTS/ \
      --deblur-dir data/test/GoPro/ --lowlight-dir data/test/LOL/
"""

from __future__ import annotations

import argparse
import json


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
    p.add_argument("--tile", type=int, default=0)
    p.add_argument("--tile-overlap", type=int, default=32)
    p.add_argument("--dtype", choices=["float32", "bfloat16"], default="float32")
    p.add_argument("--json-out", default=None, help="write the summary JSON here too")
    return p


def _eval_items(restorer, items, psnr_fn, ssim_fn):
    import jax.numpy as jnp

    from ..metrics.quality import AverageMeter
    pm, sm = AverageMeter(), AverageMeter()
    for name, deg, clean in items:
        out = restorer(deg)
        pm.update(float(psnr_fn(jnp.asarray(out), jnp.asarray(clean))))
        sm.update(float(ssim_fn(jnp.asarray(out) * 255.0,
                                jnp.asarray(clean) * 255.0)))
    return {"psnr": round(pm.avg, 4), "ssim": round(sm.avg, 5), "n": pm.count}


def main(argv=None) -> None:
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

    results = {}
    if args.denoise_path:
        ds = DenoiseTestDataset(args.denoise_path)
        for sigma in args.sigmas:
            ds.set_sigma(sigma)
            items = (ds[i] for i in range(len(ds)))
            # :g keeps fractional sigmas distinct (int() made 15.2 and 15.8
            # collide on the same key and silently overwrite each other)
            key = f"denoise_sigma{sigma:g}"
            results[key] = _eval_items(restorer, items, psnr, ssim_ref_single)
            print(f"denoise σ={sigma}: {results[key]}", flush=True)
    if args.derain_path or args.dehaze_path:
        ds = DerainDehazeDataset(args.derain_path or "", args.dehaze_path or "",
                                 task="derain" if args.derain_path else "dehaze")
        for task, path in (("derain", args.derain_path),
                           ("dehaze", args.dehaze_path)):
            if not path:
                continue
            ds.set_dataset(task)
            items = (ds[i] for i in range(len(ds)))
            results[task] = _eval_items(restorer, items, psnr, ssim_ref_single)
            print(f"{task}: {results[task]}", flush=True)
    if args.deblur_dir:
        ds = DeblurTestDataset(args.deblur_dir)
        items = (ds[i] for i in range(len(ds)))
        results["deblur"] = _eval_items(restorer, items, psnr, ssim_ref_single)
        print(f"deblur: {results['deblur']}", flush=True)
    if args.lowlight_dir:
        ds = LowLightTestDataset(args.lowlight_dir)
        items = (ds[i] for i in range(len(ds)))
        results["lowlight"] = _eval_items(restorer, items, psnr, ssim_ref_single)
        print(f"lowlight: {results['lowlight']}", flush=True)

    summary = json.dumps({"ckpt": args.ckpt, "results": results}, indent=2)
    print(summary)
    if args.json_out:
        with open(args.json_out, "w") as f:
            f.write(summary)


if __name__ == "__main__":
    main()
