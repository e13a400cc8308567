"""CLI glue tests: flag parsing, preset overlays, reference-flag aliases,
and an end-to-end tester drive (batched inference + LPIPS)."""

import json
import os

import numpy as np
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

    def test_backbone_override(self):
        p = build_parser()
        cfg = overlay_config(get_preset("derain"), p.parse_args([]))
        assert cfg.model.backbone == "restormer"
        cfg = overlay_config(get_preset("derain"),
                             p.parse_args(["--backbone", "mprnet"]))
        assert cfg.model.backbone == "mprnet"

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

    def test_task_dir_flags(self):
        """--deblur-dir/--lowlight-dir/--single-dir overlay onto DataConfig
        (driven end-to-end on TPU: runs/deblur_convergence.jsonl etc.)."""
        p = build_parser()
        args = p.parse_args([
            "--deblur-dir", "/d/blur/", "--lowlight-dir", "/d/low/",
            "--single-dir", "/d/single/",
        ])
        cfg = overlay_config(get_preset("deblur"), args)
        assert cfg.data.deblur_dir == "/d/blur/"
        assert cfg.data.lowlight_dir == "/d/low/"
        assert cfg.data.single_dir == "/d/single/"

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

    @pytest.mark.slow
    def test_rcot_train_end_to_end(self, tiny_config, tmp_path, monkeypatch):
        """Drive cli.train.main() for real on a tiny synthetic derain tree:
        one epoch -> JSONL train_step/epoch_end/validation events, a
        checkpoint + latest.npz, and mid-epoch --ckpt-every-steps files.
        (The Trainer loop has its own tests; this pins the CLI composition
        — preset overlay, fit() wiring, eval args — which parse-level
        tests cannot.)"""
        import dataclasses
        import json

        from PIL import Image

        import rcot_tpu.cli.train as train_cli

        rng = np.random.default_rng(0)
        root = tmp_path / "tree"
        for d in ("Derain/rainy", "Derain/gt", "manifests/rainy",
                  "val/input", "val/target"):
            os.makedirs(root / d)
        clean = rng.integers(0, 255, (64, 64, 3), dtype=np.uint8)
        rain = np.clip(clean.astype(int) + rng.integers(0, 60, clean.shape),
                       0, 255).astype(np.uint8)
        Image.fromarray(rain).save(root / "Derain/rainy/rain-0.png")
        Image.fromarray(clean).save(root / "Derain/gt/norain-0.png")
        (root / "manifests/rainy/rainTrain.txt").write_text(
            "rainy/rain-0.png\n")
        Image.fromarray(rain[:40, :36]).save(root / "val/input/rain-0.png")
        Image.fromarray(clean[:40, :36]).save(root / "val/target/norain-0.png")

        tiny = tiny_config.replace(data=dataclasses.replace(
            tiny_config.data, de_type=("derain",),
            oversample={"derain": 8, "denoise": 1, "deblur": 1,
                        "lowlight": 1, "single": 1}))
        monkeypatch.setattr(train_cli, "get_preset", lambda name: tiny)

        log = tmp_path / "log.jsonl"
        train_cli.main([
            "--preset", "derain", "--derain-dir", f"{root}/Derain/",
            "--data-file-dir", f"{root}/manifests/", "--batch-size", "2",
            "--n-epochs", "1", "--patch-size", "32", "--ckpt-every-steps", "2",
            "--degset", f"{root}/val/input/", "--tarset", f"{root}/val/target/",
            "--ckpt-dir", str(tmp_path / "ckpt"), "--log-file", str(log),
        ])
        events = [json.loads(l)["event"] for l in open(log)]
        assert {"epoch_start", "train_step", "epoch_end",
                "validation"} <= set(events)
        ckpts = sorted(os.listdir(tmp_path / "ckpt"))
        assert "latest.npz" in ckpts
        assert any("_step2" in c for c in ckpts)  # mid-epoch cadence


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

    def test_validate_paired_reports_all_missing_gts(self, tmp_path):
        """GT paths are derivation rules (reference util/dataset_utils.py:
        383-397), so a mis-built tree must fail up front with the full
        missing list — not crash mid-eval on the first item (that crash
        lost round-3's per-type eval, perf/r3_phase4.log)."""
        from PIL import Image

        from rcot_tpu.cli.eval_all import _validate_paired
        from rcot_tpu.data.eval_datasets import DerainDehazeDataset

        rng = np.random.default_rng(0)
        os.makedirs(tmp_path / "input")
        os.makedirs(tmp_path / "target")
        for i in range(3):
            Image.fromarray(rng.integers(0, 255, (32, 32, 3), dtype=np.uint8)
                            ).save(tmp_path / "input" / f"rain-{i}.png")
        # only rain-1's GT exists under the reference naming rule
        Image.fromarray(rng.integers(0, 255, (32, 32, 3), dtype=np.uint8)
                        ).save(tmp_path / "target" / "norain-1.png")
        ds = DerainDehazeDataset(str(tmp_path), "", task="derain")
        with pytest.raises(FileNotFoundError, match="2/3"):
            _validate_paired(ds)

    def test_failing_task_is_isolated_and_json_partial(self, tiny_config,
                                                       tmp_path):
        """A task whose folders are mis-built records {'error': ...} and a
        nonzero exit — WITHOUT killing the other tasks or the summary JSON
        (round-3 phase 4 wrote the JSON only at the end and lost every row
        already computed)."""
        import jax

        from rcot_tpu.cli.eval_all import main as eval_main
        from rcot_tpu.train.steps import create_train_state
        from rcot_tpu.utils.checkpoint import save_checkpoint

        state = create_train_state(jax.random.PRNGKey(0), tiny_config)
        ckpt = save_checkpoint(
            str(tmp_path / "m_step0"), state,
            metadata={"config": tiny_config.to_dict()})
        # derain tree with inputs but NO targets -> up-front validation error
        os.makedirs(tmp_path / "derain" / "input")
        os.makedirs(tmp_path / "derain" / "target")
        from PIL import Image
        rng = np.random.default_rng(0)
        Image.fromarray(rng.integers(0, 255, (32, 32, 3), dtype=np.uint8)
                        ).save(tmp_path / "derain" / "input" / "rain-0.png")

        out_json = tmp_path / "summary.json"
        rc = eval_main(["--ckpt", ckpt,
                        "--derain-path", str(tmp_path / "derain"),
                        "--json-out", str(out_json)])
        assert rc == 1
        results = json.loads(out_json.read_text())["results"]
        assert "error" in results["derain"]
        assert "missing" in results["derain"]["error"]

    @pytest.mark.slow
    def test_paired_task(self, tiny_config, tmp_path):
        """--paired NAME DIR evaluates a same-name input/target tree
        (sorted-glob pairing, tester.py:55-58 semantics) — covers the
        deblur/lowlight-style val folders the named flags don't."""
        import jax
        from PIL import Image

        from rcot_tpu.cli.eval_all import main as eval_main
        from rcot_tpu.train.steps import create_train_state
        from rcot_tpu.utils.checkpoint import save_checkpoint

        state = create_train_state(jax.random.PRNGKey(0), tiny_config)
        ckpt = save_checkpoint(
            str(tmp_path / "m_step0"), state,
            metadata={"config": tiny_config.to_dict()})
        rng = np.random.default_rng(0)
        os.makedirs(tmp_path / "v" / "input")
        os.makedirs(tmp_path / "v" / "target")
        img = rng.integers(0, 255, (48, 48, 3), dtype=np.uint8)
        Image.fromarray(np.clip(img.astype(int) + 30, 0, 255).astype(np.uint8)
                        ).save(tmp_path / "v" / "input" / "a.png")
        Image.fromarray(img).save(tmp_path / "v" / "target" / "a.png")
        out_json = tmp_path / "summary.json"
        rc = eval_main(["--ckpt", ckpt, "--paired", "deblur_val",
                        str(tmp_path / "v"), "--json-out", str(out_json)])
        assert rc == 0
        row = json.loads(out_json.read_text())["results"]["deblur_val"]
        assert row["n"] == 1 and np.isfinite(row["psnr"])
        assert np.isfinite(row["input_psnr"])


class TestTestCLI:
    def test_parser_defaults(self):
        from rcot_tpu.cli.test import build_parser
        args = build_parser().parse_args(
            ["--ckpt", "x.npz", "--degset", "a/", "--tarset", "b/"])
        assert args.tile == 0
        assert args.noise_sigma == 0.0
        assert args.seed == 1850  # tester_noise.py:12 parity


class TestTesterCLI:
    @pytest.mark.slow
    def test_rcot_test_batched_with_lpips(self, tiny_config, tmp_path, capsys):
        """Drive the tester CLI end-to-end: tiny checkpoint -> folder
        restoration with --batch 2 (bucket-grouped batching) and --lpips;
        outputs + metrics printed, PNGs written (reference: tester.py)."""
        import jax
        from PIL import Image

        from rcot_tpu.cli.test import main as test_main
        from rcot_tpu.train.steps import create_train_state
        from rcot_tpu.utils.checkpoint import save_checkpoint

        state = create_train_state(jax.random.PRNGKey(0), tiny_config)
        ckpt = save_checkpoint(
            str(tmp_path / "m_step0"), state,
            metadata={"config": tiny_config.to_dict()})

        rng = np.random.default_rng(0)
        deg_dir, tar_dir = tmp_path / "deg", tmp_path / "tar"
        os.makedirs(deg_dir)
        os.makedirs(tar_dir)
        for i in range(3):  # two share a bucket, one differs
            h, w = (40, 44) if i < 2 else (52, 36)
            tar = rng.integers(0, 255, (h, w, 3), dtype=np.uint8)
            deg = np.clip(tar.astype(int) + rng.integers(-40, 40, tar.shape),
                          0, 255).astype(np.uint8)
            Image.fromarray(deg).save(deg_dir / f"im{i}.png")
            Image.fromarray(tar).save(tar_dir / f"im{i}.png")

        out_dir = tmp_path / "out"
        test_main([
            "--ckpt", ckpt, "--degset", str(deg_dir), "--tarset", str(tar_dir),
            "--save", str(out_dir) + "/", "--savetar", str(tmp_path / "st") + "/",
            "--saveres", str(tmp_path / "sr") + "/", "--batch", "2", "--lpips",
        ])
        got = capsys.readouterr().out
        assert "PSNR: average" in got and "LPIPS: average" in got
        assert sorted(os.listdir(out_dir)) == ["im0.png", "im1.png", "im2.png"]

    @pytest.mark.slow
    def test_rcot_test_with_niqe_surrogate(self, tiny_config, tmp_path,
                                           capsys):
        """--niqe-model fit:<folder> fits a surrogate pristine model from
        the target folder and reports mean no-reference NIQE of the
        restored outputs (metrics/niqe.py; images must fit >= one 96px
        patch)."""
        import jax
        from PIL import Image

        from rcot_tpu.cli.test import main as test_main
        from rcot_tpu.train.steps import create_train_state
        from rcot_tpu.utils.checkpoint import save_checkpoint

        state = create_train_state(jax.random.PRNGKey(0), tiny_config)
        ckpt = save_checkpoint(
            str(tmp_path / "m_step0"), state,
            metadata={"config": tiny_config.to_dict()})
        rng = np.random.default_rng(0)
        deg_dir, tar_dir = tmp_path / "deg", tmp_path / "tar"
        os.makedirs(deg_dir)
        os.makedirs(tar_dir)
        from scipy.ndimage import gaussian_filter
        for i in range(3):  # smooth enough to have NSS structure, 128px
            base = gaussian_filter(rng.normal(0, 1, (128, 128, 3)), 2.0)
            tar = ((base - base.min()) / (np.ptp(base) + 1e-9) * 255
                   ).astype(np.uint8)
            deg = np.clip(tar.astype(int) + rng.integers(-40, 40, tar.shape),
                          0, 255).astype(np.uint8)
            Image.fromarray(deg).save(deg_dir / f"im{i}.png")
            Image.fromarray(tar).save(tar_dir / f"im{i}.png")
        test_main([
            "--ckpt", ckpt, "--degset", str(deg_dir), "--tarset", str(tar_dir),
            "--save", str(tmp_path / "out") + "/",
            "--savetar", str(tmp_path / "st") + "/",
            "--saveres", str(tmp_path / "sr") + "/",
            "--niqe-model", f"fit:{tar_dir}",
        ])
        got = capsys.readouterr().out
        assert "surrogate model fit on 3 images" in got
        assert "NIQE: average" in got and "(3 images)" in got

    @pytest.mark.slow
    def test_rcot_eval_denoise_end_to_end(self, tiny_config, tmp_path, capsys):
        """Drive the unified eval CLI for real (its load_t_params unpack
        once broke with only the parser under test): tiny checkpoint +
        one-image denoise folder -> per-sigma PSNR/SSIM summary."""
        import jax
        from PIL import Image

        from rcot_tpu.cli.eval_all import main as eval_main
        from rcot_tpu.train.steps import create_train_state
        from rcot_tpu.utils.checkpoint import save_checkpoint

        state = create_train_state(jax.random.PRNGKey(0), tiny_config)
        ckpt = save_checkpoint(
            str(tmp_path / "m_step0"), state,
            metadata={"config": tiny_config.to_dict()})
        os.makedirs(tmp_path / "clean")
        rng = np.random.default_rng(0)
        Image.fromarray(rng.integers(0, 255, (48, 48, 3), dtype=np.uint8)
                        ).save(tmp_path / "clean" / "im0.png")

        out_json = tmp_path / "summary.json"
        eval_main(["--ckpt", ckpt, "--denoise-path", str(tmp_path / "clean"),
                   "--sigmas", "25", "--json-out", str(out_json)])
        import json as _json
        summary = _json.loads(out_json.read_text())["results"]
        assert "denoise_sigma25" in summary
        row = summary["denoise_sigma25"]
        assert np.isfinite(row["psnr"])
        # the input (identity) baseline makes "beats identity" checkable
        # from the JSON alone (VERDICT r3 weak #5)
        assert np.isfinite(row["input_psnr"]) and np.isfinite(row["input_ssim"])
        assert "skipped" not in row and row["n"] == 1

    def test_rcot_test_noise_mode(self, tmp_path, capsys):
        """tester_noise parity mode: --noise-sigma synthesizes seeded noise
        on the GT (reference: tester_noise.py:93-99) and dumps res x3
        (:116) instead of x2."""
        import jax
        from PIL import Image

        from rcot_tpu.cli.test import main as test_main
        from rcot_tpu.models.mprnet import init_mprnet_tnet
        from rcot_tpu.utils.checkpoint import save_checkpoint

        params = init_mprnet_tnet(jax.random.PRNGKey(0))
        ckpt = save_checkpoint(str(tmp_path / "legacy_step0"), params,
                               metadata={"backbone": "mprnet"})
        rng = np.random.default_rng(0)
        deg_dir, tar_dir = tmp_path / "deg", tmp_path / "tar"
        os.makedirs(deg_dir)
        os.makedirs(tar_dir)
        tar = rng.integers(0, 255, (40, 40, 3), dtype=np.uint8)
        Image.fromarray(tar).save(tar_dir / "im0.png")
        Image.fromarray(tar).save(deg_dir / "im0.png")  # ignored in noise mode

        test_main([
            "--ckpt", ckpt, "--degset", str(deg_dir), "--tarset", str(tar_dir),
            "--save", str(tmp_path / "out") + "/",
            "--savetar", str(tmp_path / "st") + "/",
            "--saveres", str(tmp_path / "sr") + "/", "--noise-sigma", "50",
        ])
        assert "PSNR: average" in capsys.readouterr().out
        assert os.listdir(tmp_path / "sr") == ["im0.png"]

    @pytest.mark.slow
    def test_rcot_test_mprnet_sr_scale(self, tmp_path, capsys):
        """Legacy SR mode end-to-end: LR degraded folder + x2 HR targets,
        --sr-scale 2 -> HR outputs, finite metrics, res dump upsampled."""
        import jax
        from PIL import Image

        from rcot_tpu.cli.test import main as test_main
        from rcot_tpu.models.mprnet import init_mprnet_tnet
        from rcot_tpu.utils.checkpoint import save_checkpoint

        params = init_mprnet_tnet(jax.random.PRNGKey(0))
        ckpt = save_checkpoint(str(tmp_path / "legacy_step0"), params,
                               metadata={"backbone": "mprnet"})
        rng = np.random.default_rng(0)
        deg_dir, tar_dir = tmp_path / "deg", tmp_path / "tar"
        os.makedirs(deg_dir)
        os.makedirs(tar_dir)
        hr = rng.integers(0, 255, (48, 40, 3), dtype=np.uint8)
        Image.fromarray(hr).save(tar_dir / "im0.png")
        Image.fromarray(hr).resize((20, 24), Image.BICUBIC).save(
            deg_dir / "im0.png")

        out_dir = tmp_path / "out"
        test_main([
            "--ckpt", ckpt, "--degset", str(deg_dir), "--tarset", str(tar_dir),
            "--save", str(out_dir) + "/", "--savetar", str(tmp_path / "st") + "/",
            "--saveres", str(tmp_path / "sr") + "/", "--sr-scale", "2",
        ])
        assert "PSNR: average" in capsys.readouterr().out
        out = np.asarray(Image.open(out_dir / "im0.png"))
        assert out.shape == (48, 40, 3)  # HR-sized restoration

    def test_detect_backbone(self):
        from rcot_tpu.compat.torch_port import detect_backbone
        assert detect_backbone({"shallow_feat1.0.weight": 0}) == "mprnet"
        assert detect_backbone({"patch_embed.proj.weight": 0}) == "restormer"

    def test_rcot_test_mprnet_backbone(self, tmp_path, capsys):
        """The tester drives the legacy MPRNet backbone (the one the
        distributed pretrained weights use, reference README.md:118-120):
        raw-pytree npz + backbone metadata -> auto-detected -> restored
        folder with finite metrics."""
        import jax
        from PIL import Image

        from rcot_tpu.cli.test import main as test_main
        from rcot_tpu.models.mprnet import init_mprnet_tnet
        from rcot_tpu.utils.checkpoint import save_checkpoint

        params = init_mprnet_tnet(jax.random.PRNGKey(0))
        ckpt = save_checkpoint(str(tmp_path / "legacy_step0"), params,
                               metadata={"backbone": "mprnet"})

        rng = np.random.default_rng(0)
        deg_dir, tar_dir = tmp_path / "deg", tmp_path / "tar"
        os.makedirs(deg_dir)
        os.makedirs(tar_dir)
        tar = rng.integers(0, 255, (40, 44, 3), dtype=np.uint8)
        deg = np.clip(tar.astype(int) + rng.integers(-40, 40, tar.shape),
                      0, 255).astype(np.uint8)
        Image.fromarray(deg).save(deg_dir / "im0.png")
        Image.fromarray(tar).save(tar_dir / "im0.png")

        out_dir = tmp_path / "out"
        test_main([
            "--ckpt", ckpt, "--degset", str(deg_dir), "--tarset", str(tar_dir),
            "--save", str(out_dir) + "/", "--savetar", str(tmp_path / "st") + "/",
            "--saveres", str(tmp_path / "sr") + "/",
        ])
        got = capsys.readouterr().out
        assert "PSNR: average" in got
        assert os.listdir(out_dir) == ["im0.png"]


class TestPortEnforcement:
    def test_unported_leftovers_raise_with_names(self, monkeypatch):
        """Weights the port didn't consume mean the loaded model is a
        DIFFERENT architecture than was trained (e.g. more refinement
        blocks than the target config) — that must be a load error naming
        the keys, not mysteriously bad PSNR later."""
        from rcot_tpu.compat.torch_port import _SD, check_fully_ported

        sd = _SD({"a.weight": np.zeros(1), "refinement.4.norm1.body.weight":
                  np.zeros(8)})
        sd.take("a.weight")
        with pytest.raises(ValueError, match="refinement.4"):
            check_fully_ported(sd, "T_net")
        # benign substrings (the mprnet shared-PReLU duplicates) are exempt
        sd2 = _SD({"x.body.1.weight": np.zeros(1)})
        check_fully_ported(sd2, "T_net", benign_substrings=(".body.1.weight",))
        # and the escape hatch downgrades to a warning
        monkeypatch.setenv("RCOT_PORT_ALLOW_UNUSED", "1")
        check_fully_ported(sd, "T_net")
