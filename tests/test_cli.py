"""CLI glue tests: flag parsing, preset overlays, reference-flag aliases."""

import pytest

from rcot_tpu.cli.train import build_parser, overlay_config
from rcot_tpu.utils.config import get_preset


class TestTrainCLI:
    def test_reference_flag_aliases(self):
        """The reference's flag spellings parse (trainer.py:22-58)."""
        p = build_parser()
        args = p.parse_args([
            "--batchSize", "3", "--nEpochs", "51", "--pairnum", "10000000",
            "--Sigma", "10000", "--sigma", "1", "--de_type", "derain",
            "--type", "Deraining", "--patch_size", "128",
        ])
        cfg = overlay_config(get_preset("derain"), args)
        assert cfg.train.batch_size == 3
        assert cfg.train.num_epochs == 51
        assert cfg.train.pairnum == 10_000_000
        assert cfg.train.Sigma == 10000
        assert cfg.train.sigma == 1
        assert cfg.data.de_type == ("derain",)
        assert cfg.train.run_name == "Deraining"
        assert cfg.data.patch_size == 128

    def test_patch_size_propagates_to_critic(self):
        p = build_parser()
        args = p.parse_args(["--patch-size", "64"])
        cfg = overlay_config(get_preset("derain"), args)
        assert cfg.critic.patch_size == 64

    def test_defaults_untouched_without_flags(self):
        p = build_parser()
        args = p.parse_args([])
        cfg = overlay_config(get_preset("derain"), args)
        base = get_preset("derain")
        assert cfg.train.batch_size == base.train.batch_size
        assert cfg.model == base.model

    def test_all_presets_resolve(self):
        for name in ("derain", "dehaze", "denoise_50", "single", "all_in_one",
                     "sr_x4", "deblur", "lowlight"):
            cfg = get_preset(name)
            assert cfg.train.batch_size >= 1

    def test_loss_math_flag(self):
        p = build_parser()
        args = p.parse_args(["--loss-math", "clean"])
        cfg = overlay_config(get_preset("derain"), args)
        assert cfg.train.loss_math == "clean"

    def test_dtype_flag(self):
        p = build_parser()
        args = p.parse_args(["--dtype", "bfloat16"])
        cfg = overlay_config(get_preset("derain"), args)
        assert cfg.train.dtype == "bfloat16"


class TestFidCLI:
    def test_parser(self):
        from rcot_tpu.cli import fid
        # exercised end-to-end elsewhere; here just the arg surface
        import argparse
        with pytest.raises(SystemExit):
            fid.main(["--help"])


class TestEvalAllCLI:
    def test_parser(self):
        from rcot_tpu.cli.eval_all import build_parser
        args = build_parser().parse_args(
            ["--ckpt", "x.npz", "--denoise-path", "d/", "--sigmas", "15", "50"])
        assert args.sigmas == [15, 50]
        assert args.derain_path is None


class TestTestCLI:
    def test_parser_defaults(self):
        from rcot_tpu.cli.test import build_parser
        args = build_parser().parse_args(
            ["--ckpt", "x.npz", "--degset", "a/", "--tarset", "b/"])
        assert args.tile == 0
        assert args.noise_sigma == 0.0
        assert args.seed == 1850  # tester_noise.py:12 parity
