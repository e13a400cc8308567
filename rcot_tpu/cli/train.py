"""rcot-train: training CLI mirroring the reference trainer flags.

Reference: trainer.py:22-58 argparse. Usage:

  python -m rcot_tpu.cli.train --preset derain --batch-size 3 --patch-size 128 \
      --n-epochs 51 --pairnum 10000000 --Sigma 10000 --sigma 1

Flags overlay a named preset (utils/config.py PRESETS, which mirror the four
README recipes, README.md:99-115).
"""

from __future__ import annotations

import argparse
import dataclasses
import os

from ..utils.config import Config, get_preset


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="rcot-tpu trainer")
    p.add_argument("--preset", default="derain", help="named recipe preset")
    p.add_argument("--batch-size", "--batchSize", dest="batch_size", type=int)
    p.add_argument("--n-epochs", "--nEpochs", dest="num_epochs", type=int)
    p.add_argument("--lr", type=float)
    p.add_argument("--step", dest="lr_step", type=int)
    p.add_argument("--resume", default=None, help="checkpoint path to resume")
    p.add_argument("--pretrained", default=None,
                   help="reference .pth to port weights from")
    p.add_argument("--pairnum", type=int)
    p.add_argument("--de-type", "--de_type", dest="de_type", nargs="+")
    p.add_argument("--denoise-dir", dest="denoise_dir")
    p.add_argument("--derain-dir", dest="derain_dir")
    p.add_argument("--dehaze-dir", dest="dehaze_dir")
    p.add_argument("--deblur-dir", dest="deblur_dir")
    p.add_argument("--lowlight-dir", dest="lowlight_dir")
    p.add_argument("--single-dir", dest="single_dir")
    p.add_argument("--data-file-dir", dest="data_file_dir")
    p.add_argument("--degset", default=None, help="validation degraded folder")
    p.add_argument("--tarset", default=None, help="validation target folder")
    p.add_argument("--Sigma", type=float)
    p.add_argument("--sigma", type=float)
    p.add_argument("--optimizer", choices=["RMSprop", "Adam"])
    p.add_argument("--type", dest="run_name")
    p.add_argument("--patch-size", "--patch_size", dest="patch_size", type=int)
    p.add_argument("--num-workers", dest="num_workers", type=int)
    p.add_argument("--seed", type=int)
    p.add_argument("--dtype", choices=["float32", "bfloat16"])
    p.add_argument("--loss-math", choices=["reference", "clean"])
    p.add_argument("--fail-at-step", dest="fail_at_step", type=int,
                   help="fault injection: raise at this global step")
    p.add_argument("--ckpt-dir", dest="ckpt_dir")
    p.add_argument("--ckpt-every-steps", dest="ckpt_every_steps", type=int,
                   help="also checkpoint mid-epoch every N steps (bounds the "
                        "work lost to preemption or a wedged accelerator)")
    p.add_argument("--log-file", default=None)
    p.add_argument("--mesh-data", type=int, default=0,
                   help="data-parallel mesh size (0 = single device)")
    p.add_argument("--profile-dir", default=None,
                   help="jax.profiler trace dir (traces steps 3-8 of epoch 1)")
    # multi-host (jax.distributed); single-process runs leave these unset
    p.add_argument("--backbone", choices=["restormer", "mprnet"], default=None,
                   help="T_net backbone (default: the preset's; mprnet = the "
                        "legacy paper-v1 one, reference Net.py:179-216)")
    p.add_argument("--coordinator", default=None,
                   help="jax.distributed coordinator address host:port")
    p.add_argument("--num-processes", type=int, default=None)
    p.add_argument("--process-id", type=int, default=None)
    return p


def overlay_config(cfg: Config, args: argparse.Namespace) -> Config:
    train_fields = {f.name for f in dataclasses.fields(cfg.train)}
    data_fields = {f.name for f in dataclasses.fields(cfg.data)}
    t_over, d_over = {}, {}
    for k, v in vars(args).items():
        if v is None:
            continue
        if k in train_fields:
            t_over[k] = v
        elif k in data_fields:
            d_over[k] = tuple(v) if k == "de_type" else v
    train = dataclasses.replace(cfg.train, **t_over)
    data = dataclasses.replace(cfg.data, **d_over)
    critic = cfg.critic
    if "patch_size" in d_over:
        critic = dataclasses.replace(critic, patch_size=d_over["patch_size"])
    model = cfg.model
    if args.backbone:
        model = dataclasses.replace(model, backbone=args.backbone)
    return cfg.replace(train=train, data=data, critic=critic, model=model)


def main(argv=None) -> None:
    args = build_parser().parse_args(argv)
    cfg = overlay_config(get_preset(args.preset), args)

    from ..utils.compilation_cache import enable_compilation_cache
    enable_compilation_cache()

    from ..parallel.sharding import initialize_distributed
    initialize_distributed(args.coordinator, args.num_processes, args.process_id)

    from ..train.trainer import Trainer

    mesh = None
    if args.mesh_data:
        from ..parallel.sharding import make_mesh
        mesh = make_mesh(data=args.mesh_data)

    log_path = args.log_file or os.path.join(
        "logs", f"{cfg.train.run_name}.jsonl")
    trainer = Trainer(cfg, mesh=mesh, log_path=log_path)
    if args.resume:
        trainer.resume(args.resume)
    elif args.pretrained:
        from ..compat.torch_port import load_reference_checkpoint
        trainer.init_state()
        t_params, f_params, _, detected = load_reference_checkpoint(
            args.pretrained, cfg.model, cfg.critic, backbone="auto")
        if detected != cfg.model.backbone:
            raise SystemExit(
                f"--pretrained checkpoint is a {detected} backbone but the "
                f"run is configured for {cfg.model.backbone}; pass "
                f"--backbone {detected}")
        # the critic head is patch-size-bound (SURVEY.md §2.2 #13): carry the
        # pretrained critic only when its shapes match this run's config,
        # else keep the fresh init (the transport map is the point of
        # --pretrained; the reference would simply crash here)
        import jax

        def shapes(t):
            return [(getattr(x, "shape", None)) for x in
                    jax.tree_util.tree_leaves(t)]

        if shapes(f_params) == shapes(trainer.state.f_params):
            trainer.state = trainer.state._replace(
                t_params=t_params, f_params=f_params)
        else:
            print("note: pretrained critic head does not match this run's "
                  "patch size; keeping a fresh critic init")
            trainer.state = trainer.state._replace(t_params=t_params)
    trainer.fit(eval_degset=args.degset, eval_tarset=args.tarset,
                profile_dir=args.profile_dir)


if __name__ == "__main__":
    main()
