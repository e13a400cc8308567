"""rcot-test: folder inference + metrics CLI.

Mirrors the reference tester (reference: tester.py:13-124): restore a folder
of degraded images with a trained checkpoint, save residual/output/target
PNGs, then report FID and folder PSNR/SSIM. Differences (all fixes):
- images are reflect-padded to the network's mod-8 contract and cropped back
  instead of cropped to mod-4 (SURVEY.md §2.2 #9);
- shapes are bucketed so a folder of arbitrary sizes compiles a handful of
  XLA programs instead of one per size;
- optional --noise-sigma synthesizes noise on the target like tester_noise.py
  (reference: tester_noise.py:93-99), drawn from a seeded numpy RNG.
"""

from __future__ import annotations

import argparse
import os

import numpy as np


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="rcot-tpu tester")
    p.add_argument("--ckpt", required=True, help=".npz checkpoint (or reference .pth)")
    p.add_argument("--degset", required=True, help="degraded image folder")
    p.add_argument("--tarset", required=True, help="target image folder")
    p.add_argument("--save", default="./results/OUT/")
    p.add_argument("--savetar", default="./results/TAR/")
    p.add_argument("--saveres", default="./results/RES/")
    p.add_argument("--tile", type=int, default=0,
                   help="overlap-tiled inference tile size (0 = whole image)")
    p.add_argument("--tile-overlap", type=int, default=32)
    p.add_argument("--batch", type=int, default=1,
                   help="restore N same-bucket images per forward (the "
                        "reference loop is strictly batch-1, tester.py:63)")
    p.add_argument("--spatial", type=int, default=0,
                   help="shard full-res activations over image rows across N "
                        "devices (halo exchanges inserted by XLA)")
    p.add_argument("--noise-sigma", type=float, default=0.0,
                   help="synthesize gaussian noise on the GT (tester_noise mode)")
    p.add_argument("--seed", type=int, default=1850)  # tester_noise.py:12
    p.add_argument("--fid", action="store_true", help="also compute FID")
    p.add_argument("--inception-weights", default=None)
    p.add_argument("--lpips", action="store_true",
                   help="also report mean LPIPS (the reference lists lpips "
                        "but left the calls commented out, evaluate.py:95-96)")
    p.add_argument("--lpips-weights", default=None)
    p.add_argument("--niqe-model", default=None,
                   help="NIQE pristine-model params (.mat/.npz) or "
                        "'fit:<folder>' to fit a surrogate from a clean "
                        "folder; reports mean no-reference NIQE of the "
                        "restored outputs (metrics/niqe.py)")
    p.add_argument("--dtype", choices=["float32", "bfloat16"], default="float32")
    p.add_argument("--backbone", choices=["auto", "restormer", "mprnet"],
                   default="auto",
                   help="T_net backbone: the flagship Restormer or the legacy "
                        "MPRNet-style one the distributed pretrained weights "
                        "use (reference: README.md:118-120, Net.py:179-216). "
                        "auto = sniff .pth state_dicts / npz metadata")
    p.add_argument("--sr-scale", type=int, default=0,
                   help="legacy SR mode: bicubic-upsample inputs xN before "
                        "restoration (mprnet only, reference: Net.py:182-183)")
    return p


def save_png(path: str, img01: np.ndarray) -> None:
    from PIL import Image
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    arr = np.clip(np.asarray(img01) * 255.0 + 0.5, 0, 255).astype(np.uint8)
    Image.fromarray(arr).save(path)


def load_t_params(path: str, model_cfg, backbone: str = "auto"):
    """Load T params from our npz (using the checkpoint's own stored config
    to shape the template) or from a reference .pth. Returns
    (t_params, model_cfg, backbone) with backbone resolved if 'auto'."""
    if path.endswith(".pth"):
        from ..compat.torch_port import load_reference_checkpoint
        from ..utils.config import CriticConfig
        t_params, _, _, backbone = load_reference_checkpoint(
            path, model_cfg, CriticConfig(), backbone=backbone)
        return t_params, model_cfg, backbone
    import dataclasses

    import jax

    from ..train.steps import create_train_state
    from ..utils.checkpoint import load_checkpoint, read_metadata
    from ..utils.config import Config, CriticConfig, TrainConfig

    meta = read_metadata(path)
    raw_backbone = meta.get("backbone")  # tools/port_reference_ckpt.py marker
    if raw_backbone is None and backbone == "mprnet" and not meta.get("config"):
        raw_backbone = "mprnet"
    if raw_backbone:
        # raw T-params-pytree npz (e.g. the distributed .pth weights ported
        # once by tools/port_reference_ckpt.py), marked by top-level backbone
        # metadata — as opposed to trainer-saved full-TrainState checkpoints,
        # whose backbone lives in metadata config.model.backbone (below)
        if raw_backbone == "mprnet":
            from ..models.mprnet import init_mprnet_tnet
            template = jax.eval_shape(init_mprnet_tnet, jax.random.PRNGKey(0))
        else:
            from ..models.restormer import init_tnet
            template = jax.eval_shape(
                lambda k: init_tnet(k, model_cfg), jax.random.PRNGKey(0))
        params, _ = load_checkpoint(path, template)
        return params, model_cfg, raw_backbone
    meta_cfg = meta.get("config", {})
    if meta_cfg.get("model"):
        from ..utils.config import ModelConfig
        model_cfg = ModelConfig(**{
            k: tuple(v) if isinstance(v, list) else v
            for k, v in meta_cfg["model"].items()
            if k in {f.name for f in dataclasses.fields(ModelConfig)}})
    critic = CriticConfig(**{
        k: v for k, v in meta_cfg.get("critic", {}).items()
        if k in {f.name for f in dataclasses.fields(CriticConfig)}})
    train = TrainConfig(**{
        k: tuple(v) if isinstance(v, list) else v
        for k, v in meta_cfg.get("train", {}).items()
        if k in {f.name for f in dataclasses.fields(TrainConfig)}})
    cfg = Config(model=model_cfg, critic=critic, train=train)
    template = jax.eval_shape(
        lambda k: create_train_state(k, cfg), jax.random.PRNGKey(0))
    state, _ = load_checkpoint(path, template)
    return state.t_params, model_cfg, model_cfg.backbone


def main(argv=None) -> None:
    args = build_parser().parse_args(argv)

    import jax.numpy as jnp

    from ..data.datasets import eval_pairs, load_rgb
    from ..metrics.quality import AverageMeter, psnr, ssim_ref_single
    from ..models.inference import make_restorer
    from ..utils.compilation_cache import enable_compilation_cache
    from ..utils.config import ModelConfig

    enable_compilation_cache()
    mesh = None
    if args.spatial > 1:
        from ..parallel.sharding import make_mesh
        mesh = make_mesh(data=1, spatial=args.spatial)
    params, model_cfg, backbone = load_t_params(
        args.ckpt, ModelConfig(), backbone=args.backbone)
    restorer = make_restorer(
        params, model_cfg, tile=args.tile, tile_overlap=args.tile_overlap,
        dtype=jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32,
        mesh=mesh, backbone=backbone, sr_scale=args.sr_scale)

    rng = np.random.default_rng(args.seed)
    p_meter, s_meter = AverageMeter(), AverageMeter()
    l_meter = AverageMeter()
    lpips_fn = None
    if args.lpips:
        import jax

        from ..metrics.lpips import init_lpips_params, lpips as lpips_dist
        lp = init_lpips_params(args.lpips_weights)
        lpips_fn = jax.jit(lambda a, b: lpips_dist(lp, a, b))
    n_meter = AverageMeter()
    niqe_model = None
    if args.niqe_model:
        from ..metrics import niqe as niqe_mod
        if args.niqe_model.startswith("fit:"):
            folder = args.niqe_model[4:]
            from ..data.datasets import list_image_folder
            imgs = [load_rgb(f).astype(np.float64)
                    for f in list_image_folder(folder)]
            niqe_model = niqe_mod.fit_niqe_model(imgs)
            print(f"NIQE: surrogate model fit on {len(imgs)} images from "
                  f"{folder} (relative scores only)")
        else:
            niqe_model = niqe_mod.load_niqe_model(args.niqe_model)
    best = (-1.0, None)
    worst = (1e9, None)

    def flush(chunk):
        outs = (restorer.restore_batch([deg for _, deg, _ in chunk])
                if args.batch > 1 else
                [restorer(deg) for _, deg, _ in chunk])
        for (name, deg, tar), out in zip(chunk, outs):
            if out.shape != deg.shape:  # legacy SR mode: LR in, HR out
                from PIL import Image
                lr = Image.fromarray(
                    np.clip(deg * 255.0 + 0.5, 0, 255).astype(np.uint8))
                up = lr.resize((out.shape[1], out.shape[0]), Image.BICUBIC)
                deg_vis = np.asarray(up, np.float32) / 255.0
            else:
                deg_vis = deg
            res = deg_vis - out
            # residual dump gain: x2 normally (tester.py:106), x3 in noise
            # mode (tester_noise.py:116)
            res_gain = 3.0 if args.noise_sigma > 0 else 2.0
            save_png(os.path.join(args.saveres, name), res_gain * res)
            save_png(os.path.join(args.save, name), out)
            save_png(os.path.join(args.savetar, name), tar)

            p = float(psnr(jnp.asarray(out), jnp.asarray(tar), 1.0))
            s = float(ssim_ref_single(jnp.asarray(out) * 255.0,
                                      jnp.asarray(tar) * 255.0))
            p_meter.update(p)
            s_meter.update(s)
            if lpips_fn is not None:
                l_meter.update(float(lpips_fn(jnp.asarray(out)[None],
                                              jnp.asarray(tar)[None])[0]))
            if niqe_model is not None:
                from ..metrics import niqe as niqe_mod
                try:
                    n_meter.update(niqe_mod.niqe(np.asarray(out, np.float64),
                                                 niqe_model))
                except ValueError as e:  # image smaller than one 96px patch
                    print(f"niqe skip {name}: {e}")
            nonlocal best, worst
            if p > best[0]:
                best = (p, name)
            if p < worst[0]:
                worst = (p, name)
            print(f"{name}: psnr {p:.4f} ssim {s:.4f}")

    chunk = []
    for deg_path, tar_path in eval_pairs(args.degset, args.tarset):
        name = os.path.basename(deg_path)
        tar = load_rgb(tar_path).astype(np.float32) / 255.0
        s = max(args.sr_scale, 1)
        if args.noise_sigma > 0:
            # noise mode synthesizes the degraded input from the target —
            # don't decode the degset image just to discard it
            noise = rng.standard_normal(tar.shape) * args.noise_sigma / 255.0
            deg = np.clip(tar + noise, 0.0, 1.0).astype(np.float32)
        else:
            deg = load_rgb(deg_path).astype(np.float32) / 255.0
            expect = (deg.shape[0] * s, deg.shape[1] * s, deg.shape[2])
            if tar.shape != expect:
                print(f"skip {name}: shape mismatch {deg.shape} vs {tar.shape}"
                      + (f" (sr x{s})" if s > 1 else ""))
                continue
        chunk.append((name, deg, tar))
        if len(chunk) >= max(args.batch, 1):
            flush(chunk)
            chunk = []
    if chunk:
        flush(chunk)

    print(f"PSNR: average {p_meter.avg:.5f}  best {best[1]} {best[0]:.4f}  "
          f"worst {worst[1]} {worst[0]:.4f}")
    print(f"SSIM: average {s_meter.avg:.5f}")
    if lpips_fn is not None:
        print(f"LPIPS: average {l_meter.avg:.5f}")
    if niqe_model is not None and n_meter.count:
        print(f"NIQE: average {n_meter.avg:.5f} ({n_meter.count} images)")

    if args.fid:
        from .fid import compute_fid_folders
        fid = compute_fid_folders(args.savetar, args.save,
                                  weights=args.inception_weights)
        print(f"FID value: {fid:.4f}")


if __name__ == "__main__":
    main()
