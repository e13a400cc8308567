"""Tests for the auxiliary components: imresize, schedulers, GAN/TV losses,
eval datasets, val-utils metrics."""

import os

import jax.numpy as jnp
import numpy as np
import pytest

from rcot_tpu.data.imresize import imresize, np_imresize
from rcot_tpu.train import schedulers as sched
from rcot_tpu.train.losses import gan_loss, tv_loss


class TestImresize:
    def test_downscale_shapes(self, rng):
        img = rng.uniform(size=(37, 53, 3))
        out = imresize(img, scale=0.5)
        assert out.shape == (19, 27, 3)

    def test_upscale_x4(self, rng):
        img = rng.uniform(size=(16, 16, 3))
        assert imresize(img, scale=4.0).shape == (64, 64, 3)

    def test_box_downscale_is_block_mean(self):
        """Box kernel at exact 0.5 averages 2x2 blocks (interior)."""
        img = np.arange(64, dtype=np.float64).reshape(8, 8, 1)
        out = imresize(img, scale=0.5, kernel="box")
        blocks = img.reshape(4, 2, 4, 2, 1).mean(axis=(1, 3))
        np.testing.assert_allclose(out, blocks, atol=1e-9)

    def test_uint8_roundtrip(self, rng):
        img = (rng.uniform(size=(16, 16, 3)) * 255).astype(np.uint8)
        out = imresize(img, scale=2.0)
        assert out.dtype == np.uint8

    def test_grayscale(self, rng):
        img = rng.uniform(size=(16, 16))
        assert imresize(img, scale=0.5).shape == (8, 8)

    def test_identity_scale_one(self, rng):
        img = rng.uniform(size=(9, 9, 3))
        np.testing.assert_allclose(imresize(img, scale=1.0), img, atol=1e-12)

    def test_output_shape_arg(self, rng):
        img = rng.uniform(size=(20, 30, 3))
        assert np_imresize(img, output_shape=(10, 10)).shape == (10, 10, 3)

    def test_matches_reference_goldens(self):
        """Pins our re-derived imresize against captured outputs of the
        reference's util/imresize.py (tools/make_imresize_golden.py):
        exact zero for cubic/linear/box, ~7e-8 for lanczos (float
        accumulation order)."""
        z = np.load(os.path.join(os.path.dirname(__file__), "goldens",
                                 "imresize_golden.npz"))
        names = sorted({k.rsplit("__", 1)[0] for k in z.files})
        assert len(names) == 8
        for n in names:
            scale, oh, ow = z[f"{n}__meta"]
            got = imresize(
                z[f"{n}__in"],
                scale=None if scale < 0 else float(scale),
                output_shape=None if oh < 0 else (int(oh), int(ow)),
                kernel=bytes(z[f"{n}__kernel"]).decode())
            np.testing.assert_allclose(got, z[f"{n}__out"], rtol=0,
                                       atol=1e-7, err_msg=n)


class TestSchedulers:
    def test_multistep_restart(self):
        fn = sched.multistep_restart([10, 20], gamma=0.1)
        assert fn(0) == 1.0
        assert fn(10) == pytest.approx(0.1)
        assert fn(25) == pytest.approx(0.01)

    def test_multistep_restart_weight_persists(self):
        """The reference scheduler SETS lr = initial*weight at a restart and
        that base persists; milestones after the restart multiply gamma on
        (a previous version applied the weight only AT the restart step)."""
        fn = sched.multistep_restart([30], gamma=0.1,
                                     restarts=(0, 25), restart_weights=(1.0, 0.5))
        assert fn(10) == pytest.approx(1.0)
        assert fn(25) == pytest.approx(0.5)   # restart
        assert fn(27) == pytest.approx(0.5)   # persists
        assert fn(35) == pytest.approx(0.05)  # milestone decays off 0.5
        # milestones BEFORE the restart don't leak through it
        fn2 = sched.multistep_restart([10], gamma=0.1,
                                      restarts=(0, 20), restart_weights=(1.0, 0.5))
        assert fn2(15) == pytest.approx(0.1)
        assert fn2(25) == pytest.approx(0.5)
        # restart order must not matter ("last restart" = largest <= step)
        fn3 = sched.multistep_restart([30], gamma=0.1,
                                      restarts=(25, 0), restart_weights=(0.5, 1.0))
        assert fn3(26) == pytest.approx(0.5)

    def test_cosine_restart_holds_floor_past_schedule_end(self):
        """Past sum(periods) the LR holds at the final value instead of
        riding the cosine back up (it silently resurged to full base_lr at
        2x the schedule length; the reference raises there)."""
        fn = sched.cosine_annealing_restart([10], (1.0,), eta_min=0.01,
                                            base_lr=1.0)
        assert fn(10) == pytest.approx(0.01)
        assert fn(15) == pytest.approx(0.01)   # was rising again
        assert fn(20) == pytest.approx(0.01)   # was back at base_lr
        fnc = sched.cosine_annealing_restart_cyclic(
            [10], (1.0,), eta_mins=(0.02,), base_lr=1.0)
        assert fnc(25) == pytest.approx(0.02)

    def test_linear(self):
        fn = sched.linear(100)
        assert fn(0) == 1.0
        assert fn(50) == pytest.approx(0.5)
        assert fn(100) == 0.0

    def test_cosine_annealing_restart(self):
        fn = sched.cosine_annealing_restart([10, 10], (1.0, 0.5), base_lr=1.0)
        assert fn(0) == pytest.approx(1.0)
        assert fn(5) == pytest.approx(0.5)  # cos(pi/2) midpoint
        assert fn(10) == pytest.approx(0.5 * 0.5 * 2)  # restart at weight 0.5

    def test_cyclic_eta_mins(self):
        fn = sched.cosine_annealing_restart_cyclic(
            [10, 10], (1.0, 1.0), eta_mins=(0.0, 0.1), base_lr=1.0)
        assert fn(0) == pytest.approx(1.0)
        assert fn(10) == pytest.approx(0.1 + 0.5 * 0.9 * 2)

    def test_warmup_cosine(self):
        fn = sched.linear_warmup_cosine(5, 20, warmup_start_lr=0.0, base_lr=1.0)
        assert fn(0) == 0.0
        assert fn(4) == pytest.approx(1.0)
        assert fn(20) == pytest.approx(0.0, abs=1e-9)

    def test_vibrate_bounds(self):
        fn = sched.vibrate(1000)
        vals = [fn(s) for s in range(0, 1000, 37)]
        assert all(0.0 <= v <= 1.0 for v in vals)


class TestAuxLosses:
    def test_lsgan(self):
        s = jnp.array([0.5, 1.5])
        assert float(gan_loss(s, True, "lsgan")) == pytest.approx(
            np.mean((np.array([0.5, 1.5]) - 1) ** 2))

    def test_vanilla_matches_bce_logits(self):
        torch = pytest.importorskip("torch")
        s = np.array([0.3, -0.7, 2.0], np.float32)
        got = float(gan_loss(jnp.asarray(s), True, "vanilla"))
        want = torch.nn.functional.binary_cross_entropy_with_logits(
            torch.from_numpy(s), torch.ones(3)).item()
        assert got == pytest.approx(want, rel=1e-5)

    def test_wgan_sign(self):
        s = jnp.array([1.0, 3.0])
        assert float(gan_loss(s, True, "wgan")) == -2.0
        assert float(gan_loss(s, False, "wgan")) == 2.0

    def test_tv_loss_standard_math(self, rng):
        """The INTENDED jxgu1016 TVLoss math (per-element counts include
        channels); the reference's own copy is scrambled dead code — see
        tv_loss's docstring for the documented deviation."""
        x = rng.uniform(size=(2, 6, 5, 3)).astype(np.float32)
        got = float(tv_loss(jnp.asarray(x), weight=2.0))
        b, h, w, c = x.shape
        dh = np.sum((x[:, 1:] - x[:, :-1]) ** 2)
        dw = np.sum((x[:, :, 1:] - x[:, :, :-1]) ** 2)
        want = 2.0 * 2.0 * (dh / (c * (h - 1) * w) + dw / (c * h * (w - 1))) / b
        assert got == pytest.approx(want, rel=1e-5)


class TestEvalDatasets:
    @pytest.fixture(scope="class")
    def tree(self, tmp_path_factory):
        from PIL import Image
        root = tmp_path_factory.mktemp("eval")
        rng = np.random.default_rng(0)

        def w(path, h=48, wd=48):
            os.makedirs(os.path.dirname(path), exist_ok=True)
            Image.fromarray(rng.integers(0, 255, (h, wd, 3), dtype=np.uint8)).save(path)

        w(f"{root}/denoise/a.png")
        w(f"{root}/derain/input/1_rain.png")
        w(f"{root}/derain/target/1_norain.png")
        w(f"{root}/dehaze/input/0001_0.9.png")
        w(f"{root}/dehaze/target/0001.png")
        w(f"{root}/gopro/test/blur/x.png")
        w(f"{root}/gopro/test/sharp/x.png")
        w(f"{root}/lol/low/y.png")
        w(f"{root}/lol/high/y.png")
        return str(root)

    def test_denoise(self, tree):
        from rcot_tpu.data.eval_datasets import DenoiseTestDataset
        ds = DenoiseTestDataset(f"{tree}/denoise/", sigma=25)
        name, noisy, clean = ds[0]
        assert name == "a"
        assert noisy.shape == clean.shape == (48, 48, 3)
        assert not np.array_equal(noisy, clean)
        ds.set_sigma(50)
        assert ds.sigma == 50

    def test_derain_dehaze_paths(self, tree):
        from rcot_tpu.data.eval_datasets import DerainDehazeDataset
        ds = DerainDehazeDataset(f"{tree}/derain/", f"{tree}/dehaze/", "derain")
        name, deg, clean = ds[0]
        assert len(ds) == 1 and deg.shape == clean.shape
        ds.set_dataset("dehaze")
        name, deg, clean = ds[0]
        assert deg.shape == clean.shape

    def test_deblur_lowlight(self, tree):
        from rcot_tpu.data.eval_datasets import (DeblurTestDataset,
                                                 LowLightTestDataset)
        d = DeblurTestDataset(f"{tree}/gopro/")
        assert len(d) == 1 and d[0][1].shape == (48, 48, 3)
        l = LowLightTestDataset(f"{tree}/lol/")
        assert len(l) == 1 and l[0][2].shape == (48, 48, 3)


class TestValUtils:
    def test_compute_psnr_ssim(self, rng):
        from rcot_tpu.metrics.quality import compute_psnr_ssim
        a = jnp.asarray(rng.uniform(size=(2, 32, 32, 3)).astype(np.float32))
        noise = rng.normal(0, 0.05, (2, 32, 32, 3)).astype(np.float32)
        b = jnp.clip(a + noise, 0, 1)
        p, s, n = compute_psnr_ssim(b, a)
        assert n == 2
        assert 20 < float(p) < 40
        assert 0.5 < float(s) < 1.0

    def test_niqe_requires_pristine_model(self):
        # the real NIQE implementation + its math tests live in
        # metrics/niqe.py / tests/test_niqe.py; the quality-facade contract
        # is "no silent default model"
        from rcot_tpu.metrics.quality import niqe
        with pytest.raises(ValueError, match="pristine model"):
            niqe(jnp.ones((128, 128)))

    def test_timer(self):
        from rcot_tpu.metrics.quality import Timer
        t = Timer()
        t.tic()
        t.hold()
        assert t.release() >= 0.0
        assert t.acc == 0.0


class TestImageIO:
    """utils/image_io.py — the main-path subset of the reference's
    util/image_io.py (converters :39-80, grid save, SOTS border crop :20-37)."""

    def test_pil_np_roundtrip(self):
        from PIL import Image
        from rcot_tpu.utils.image_io import np_to_pil, pil_to_np
        rng = np.random.default_rng(0)
        arr = rng.uniform(size=(17, 23, 3)).astype(np.float32)
        back = pil_to_np(np_to_pil(arr))
        assert back.shape == (17, 23, 3)
        assert back.dtype == np.float32
        # quantized to 1/255 with round-half-up: error bounded by half a level
        assert np.abs(back - arr).max() <= (0.5 / 255.0) + 1e-6
        gray = np_to_pil(arr[..., :1])  # single-channel squeeze path
        assert isinstance(gray, Image.Image) and gray.mode == "L"

    def test_save_image_grid_geometry(self, tmp_path):
        from PIL import Image
        from rcot_tpu.utils.image_io import save_image
        imgs = np.full((5, 8, 6, 3), 0.5, np.float32)
        path = str(tmp_path / "grid.png")
        save_image(path, imgs, nrow=4, padding=2)
        with Image.open(path) as im:
            w, h = im.size
        # 5 images at nrow=4 -> 2 rows x 4 cols, padding 2 on every seam+border
        assert (w, h) == (4 * (6 + 2) + 2, 2 * (8 + 2) + 2)

    def test_save_image_accepts_single_image(self, tmp_path):
        from rcot_tpu.utils.image_io import save_image
        path = str(tmp_path / "one.png")
        save_image(path, np.zeros((8, 8, 3), np.float32))
        assert os.path.exists(path)

    def test_prepare_gt_img_sots_crop(self):
        from rcot_tpu.utils.image_io import prepare_gt_img
        img = np.zeros((64, 48, 3), np.float32)
        out = prepare_gt_img(img, d=10)
        assert out.shape == (44, 28, 3)

    def test_save_sample_grid_names(self, tmp_path):
        from rcot_tpu.utils.image_io import save_sample_grid
        save_sample_grid(str(tmp_path), "ep3",
                         output=np.zeros((8, 8, 3), np.float32),
                         target=np.ones((8, 8, 3), np.float32))
        assert sorted(os.listdir(tmp_path)) == ["ep3_output.png", "ep3_target.png"]


class TestMetricsLogger:
    def test_non_finite_floats_serialize_as_null(self, tmp_path):
        """json.dumps would emit literal NaN/Infinity — invalid strict JSON
        that jq/pandas reject (the reference's .mat dumps had exactly this
        NaN-poisoning problem). Non-finite floats must become null."""
        import json

        from rcot_tpu.utils.logging import MetricsLogger

        path = str(tmp_path / "log.jsonl")
        log = MetricsLogger(path, stdout=False, process_index=0)
        log.log("epoch_end", mean_sec_per_step=float("nan"),
                patches_per_sec=float("inf"), images=3,
                loss=np.float32("nan"))
        log.close()
        rec = json.loads(open(path).read())  # strict parser must accept it
        assert rec["mean_sec_per_step"] is None
        assert rec["patches_per_sec"] is None
        assert rec["loss"] is None
        assert rec["images"] == 3

    def test_step_timer_items_per_sec_uses_actual_counts(self):
        """Throughput comes from the per-call item counts (correct for a
        short final batch), not a constant batch size."""
        from rcot_tpu.utils.logging import StepTimer

        t = StepTimer(warmup=0)
        for n in (4, 4, 2):  # short final batch
            t.start()
            t.stop(n)
        assert t.items == 10
        assert t.items_per_sec() == pytest.approx(10 / t.total)


class TestEdgeMap:
    """ops/edges.py vs the reference EdgeComputation math
    (reference: util/image_utils.py:14-45)."""

    def _torch_oracle(self, x_nchw):
        """Reference EdgeComputation(test=True) math, re-stated in torch."""
        import torch

        x = torch.from_numpy(x_nchw)
        dx = torch.abs(x[:, :, :, 1:] - x[:, :, :, :-1])
        dy = torch.abs(x[:, :, 1:, :] - x[:, :, :-1, :])
        y = torch.zeros_like(x)
        y[:, :, :, 1:] += dx
        y[:, :, :, :-1] += dx
        y[:, :, 1:, :] += dy
        y[:, :, :-1, :] += dy
        return (torch.sum(y, 1, keepdim=True) / 3 / 4).numpy()

    def test_matches_torch_oracle(self, rng):
        from rcot_tpu.ops.edges import edge_map

        x = rng.uniform(size=(2, 9, 7, 3)).astype(np.float32)
        ours = np.asarray(edge_map(jnp.asarray(x)))
        ref = self._torch_oracle(x.transpose(0, 3, 1, 2))  # NHWC -> NCHW
        np.testing.assert_allclose(ours, ref.transpose(0, 2, 3, 1), atol=1e-6)

    def test_unbatched_chw_branch_values(self, rng):
        """The reference's test=False branch computes the same per-pixel
        values on a single CHW image; ours takes one HWC image."""
        from rcot_tpu.ops.edges import edge_map

        x = rng.uniform(size=(5, 6, 3)).astype(np.float32)
        single = np.asarray(edge_map(jnp.asarray(x)))
        batched = np.asarray(edge_map(jnp.asarray(x)[None]))[0]
        np.testing.assert_allclose(single, batched, atol=0)
        # constant image -> zero edges; /3 quirk holds for C != 3 too
        flat = np.asarray(edge_map(jnp.ones((4, 4, 5))))
        np.testing.assert_allclose(flat, 0.0, atol=0)
