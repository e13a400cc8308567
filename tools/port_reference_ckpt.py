"""One-time port of a reference .pth checkpoint to a native npz checkpoint.

The reference distributes pretrained weights as pickled nn.Module
checkpoints ({"epoch", "Tnet", "Fnet"}, reference: trainer.py:362-371) on
either backbone (the GDrive weights use the legacy MPRNet one,
README.md:118-120). This tool unpickles them ONCE (requires torch + the
reference code importable) and writes a pure-pytree npz that every rcot-tpu
surface consumes without torch:

  python tools/port_reference_ckpt.py model_sr.pth model_sr.npz
  rcot-test --ckpt model_sr.npz ...       # backbone auto-detected

For the mprnet backbone the npz holds the raw T-params pytree with
{"backbone": "mprnet"} metadata; for the restormer backbone it holds the
same raw pytree with the detected backbone marker. (Critic weights are for
training resumption only and are not carried — the reference testers also
load only ["Tnet"], tester.py:54.)
"""

import sys

sys.path.insert(0, ".")


def main(argv):
    if len(argv) != 2:
        print(__doc__)
        return 2
    src, dst = argv
    from rcot_tpu.compat.torch_port import load_reference_checkpoint
    from rcot_tpu.utils.checkpoint import save_checkpoint
    from rcot_tpu.utils.config import CriticConfig, ModelConfig

    t_params, _, epoch, backbone = load_reference_checkpoint(
        src, ModelConfig(), CriticConfig(), backbone="auto")
    if dst.endswith(".npz"):
        dst = dst[: -len(".npz")]
    path = save_checkpoint(dst, t_params,
                           metadata={"backbone": backbone, "epoch": epoch})
    print(f"ported {src} (backbone={backbone}, epoch={epoch}) -> {path}")
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
