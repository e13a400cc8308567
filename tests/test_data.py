"""Data layer tests: GT-path rules, oversampling, crops, device preproc."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rcot_tpu.data.datasets import (TrainIndex, crop_to_base, eval_pairs,
                                    get_patch_pair, haze_gt_path, rain_gt_path)
from rcot_tpu.data.degradations import augment_and_degrade, dihedral
from rcot_tpu.data.pipeline import TrainLoader
from rcot_tpu.utils.config import Config, DataConfig, TrainConfig

PIL = pytest.importorskip("PIL")
from PIL import Image  # noqa: E402


def _write_img(path, h=48, w=48, seed=0):
    os.makedirs(os.path.dirname(path), exist_ok=True)
    rng = np.random.default_rng(seed)
    Image.fromarray(rng.integers(0, 255, (h, w, 3), dtype=np.uint8)).save(path)


@pytest.fixture(scope="module")
def fake_data(tmp_path_factory):
    """Tiny synthetic dataset tree mirroring the reference layout
    (manifests + rainy/gt + synthetic/original path rules)."""
    root = tmp_path_factory.mktemp("data")
    ddir = str(root) + "/"

    # denoise: clean folder + manifest
    for i in range(3):
        _write_img(f"{ddir}Train/Denoise/img{i}.png", seed=i)
    os.makedirs(f"{ddir}manifests/noisy", exist_ok=True)
    with open(f"{ddir}manifests/noisy/denoise.txt", "w") as f:
        f.write("img0.png\nimg1.png\nimg2.png\n")

    # derain: rainy/rain-N.png + gt/norain-N.png
    for i in range(2):
        _write_img(f"{ddir}Train/Derain/rainy/rain-{i}.png", seed=10 + i)
        _write_img(f"{ddir}Train/Derain/gt/norain-{i}.png", seed=20 + i)
    os.makedirs(f"{ddir}manifests/rainy", exist_ok=True)
    with open(f"{ddir}manifests/rainy/rainTrain.txt", "w") as f:
        f.write("rainy/rain-0.png\nrainy/rain-1.png\n")

    # dehaze: synthetic/<p>_x.png + original/<p>.png
    _write_img(f"{ddir}Train/Dehaze/synthetic/0001_0.8.png", seed=30)
    _write_img(f"{ddir}Train/Dehaze/original/0001.png", seed=31)
    os.makedirs(f"{ddir}manifests/hazy", exist_ok=True)
    with open(f"{ddir}manifests/hazy/hazy_outside.txt", "w") as f:
        f.write("synthetic/0001_0.8.png\n")

    return DataConfig(
        de_type=("denoise_25", "derain", "dehaze"),
        data_file_dir=f"{ddir}manifests/",
        denoise_dir=f"{ddir}Train/Denoise/",
        derain_dir=f"{ddir}Train/Derain/",
        dehaze_dir=f"{ddir}Train/Dehaze/",
        patch_size=32,
        num_workers=2,
    )


class TestPathRules:
    def test_rain_gt(self):
        assert rain_gt_path("/d/Derain/rainy/rain-12.png") == \
            "/d/Derain/gt/norain-12.png"

    def test_haze_gt(self):
        assert haze_gt_path("/d/Dehaze/synthetic/0055_0.9_0.2.jpg") == \
            "/d/Dehaze/original/0055.jpg"

    def test_crop_to_base(self):
        img = np.zeros((37, 50, 3), np.uint8)
        out = crop_to_base(img, 16)
        assert out.shape == (32, 48, 3)


class TestTrainIndex:
    def test_oversampling_counts(self, fake_data):
        idx = TrainIndex(fake_data)
        # denoise_25: 3 imgs x5; derain: 2 x360; dehaze: 1 x1
        assert len(idx) == 3 * 5 + 2 * 360 + 1

    def test_de_ids(self, fake_data):
        idx = TrainIndex(fake_data)
        ids = {s.de_id for s in idx.samples}
        assert ids == {1, 3, 4}

    def test_patch_pair_shapes(self, fake_data):
        import random
        idx = TrainIndex(fake_data)
        rng = random.Random(0)
        for s in [idx.samples[0], idx.samples[-1]]:
            d, c, i = get_patch_pair(s, 32, 16, rng)
            assert d.shape == c.shape == (32, 32, 3)
            assert d.dtype == c.dtype == np.uint8

    def test_denoise_pair_is_identical_clean(self, fake_data):
        import random
        idx = TrainIndex(fake_data)
        s = next(s for s in idx.samples if s.de_id < 3)
        d, c, _ = get_patch_pair(s, 32, 16, random.Random(1))
        np.testing.assert_array_equal(d, c)


class TestDeviceAugment:
    def test_dihedral_matches_numpy_reference(self, rng):
        """Mode map vs util/image_utils.py:133-163 semantics."""
        x = rng.integers(0, 255, (8, 8, 3)).astype(np.uint8)
        expected = {
            1: np.flipud(x), 2: np.rot90(x), 3: np.flipud(np.rot90(x)),
            4: np.rot90(x, 2), 5: np.flipud(np.rot90(x, 2)),
            6: np.rot90(x, 3), 7: np.flipud(np.rot90(x, 3)),
        }
        for mode, want in expected.items():
            got = np.asarray(dihedral(jnp.asarray(x), jnp.int32(mode)))
            np.testing.assert_array_equal(got, want, err_msg=f"mode {mode}")

    def test_noise_statistics(self, rng):
        clean = np.full((4, 32, 32, 3), 128, np.uint8)
        de_id = jnp.array([2, 2, 2, 2], jnp.int32)  # sigma=50
        deg, cl = augment_and_degrade(
            jax.random.PRNGKey(0), jnp.asarray(clean), jnp.asarray(clean), de_id)
        noise_std = float(jnp.std(deg * 255 - cl * 255))
        assert 44.0 < noise_std < 52.0  # sigma 50, clipped at [0,255]
        assert float(deg.min()) >= 0.0 and float(deg.max()) <= 1.0

    def test_paired_passthrough_and_joint_augment(self, rng):
        a = rng.integers(0, 255, (2, 16, 16, 3)).astype(np.uint8)
        b = a + 0  # same content -> stays equal iff augmented jointly
        de_id = jnp.array([3, 4], jnp.int32)
        deg, cl = augment_and_degrade(
            jax.random.PRNGKey(1), jnp.asarray(a), jnp.asarray(b), de_id)
        np.testing.assert_allclose(np.asarray(deg), np.asarray(cl), atol=1e-7)

    def test_never_identity_augment(self):
        x = np.arange(16 * 16 * 3, dtype=np.uint8).reshape(1, 16, 16, 3) % 251
        for s in range(20):
            deg, cl = augment_and_degrade(
                jax.random.PRNGKey(s), jnp.asarray(x), jnp.asarray(x),
                jnp.array([3], jnp.int32))
            assert not np.array_equal(np.asarray(cl[0] * 255), x[0].astype(np.float32))


class TestLoader:
    def test_deterministic_and_resumable(self, fake_data):
        cfg = Config(data=fake_data, train=TrainConfig(batch_size=4))
        loader = TrainLoader(cfg, seed=7, process_index=0, process_count=1)
        run1 = [b for _, b in zip(range(4), loader.epoch(1))]
        run2 = [b for _, b in zip(range(4), loader.epoch(1))]
        for a, b in zip(run1, run2):
            np.testing.assert_array_equal(a.degraded, b.degraded)
            np.testing.assert_array_equal(a.de_id, b.de_id)
        # resume mid-epoch at step 2
        resumed = [b for _, b in zip(range(2), loader.epoch(1, start_step=2))]
        np.testing.assert_array_equal(resumed[0].degraded, run1[2].degraded)

    def test_native_loader_matches_pil(self, fake_data):
        """The C++ loader and the PIL fallback must produce identical
        batches (same decode bytes, same RNG draw order)."""
        from rcot_tpu.data import native
        if not native.available():
            pytest.skip("native loader not built (native/build.sh)")
        cfg = Config(data=fake_data, train=TrainConfig(batch_size=4))
        ln = TrainLoader(cfg, seed=5, process_index=0, process_count=1,
                         use_native=True)
        lp = TrainLoader(cfg, seed=5, process_index=0, process_count=1,
                         use_native=False)
        for bn, bp in zip(ln.epoch(1), lp.epoch(1)):
            np.testing.assert_array_equal(bn.degraded, bp.degraded)
            np.testing.assert_array_equal(bn.clean, bp.clean)
            np.testing.assert_array_equal(bn.de_id, bp.de_id)

    def test_native_matches_pil_on_size_mismatched_pair(self, tmp_path):
        """A paired pair whose degraded/clean DIMENSIONS differ (different
        mod-16 remainders -> different crop_to_base offsets): the native
        loader used to apply the degraded image's offsets to the clean image
        and silently diverge from the PIL path."""
        from rcot_tpu.data import native
        if not native.available():
            pytest.skip("native loader not built (native/build.sh)")
        ddir = str(tmp_path) + "/"
        _write_img(f"{ddir}Train/Derain/rainy/rain-0.png", h=48, w=48, seed=1)
        _write_img(f"{ddir}Train/Derain/gt/norain-0.png", h=54, w=58, seed=2)
        os.makedirs(f"{ddir}manifests/rainy", exist_ok=True)
        with open(f"{ddir}manifests/rainy/rainTrain.txt", "w") as f:
            f.write("rainy/rain-0.png\n")
        data = DataConfig(de_type=("derain",), data_file_dir=f"{ddir}manifests/",
                          derain_dir=f"{ddir}Train/Derain/", patch_size=32,
                          num_workers=1,
                          oversample={"derain": 4, "denoise": 1, "deblur": 1,
                                      "lowlight": 1, "single": 1})
        cfg = Config(data=data, train=TrainConfig(batch_size=2))
        ln = TrainLoader(cfg, seed=5, process_index=0, process_count=1,
                         use_native=True)
        lp = TrainLoader(cfg, seed=5, process_index=0, process_count=1,
                         use_native=False)
        for bn, bp in zip(ln.epoch(1), lp.epoch(1)):
            np.testing.assert_array_equal(bn.degraded, bp.degraded)
            np.testing.assert_array_equal(bn.clean, bp.clean)

    def test_native_build_failure_is_cached(self, tmp_path, monkeypatch):
        """A deterministic compile failure must not be re-paid by every
        fresh process (advisor r3: on a 1-core host each loader worker
        repaid up to the 120 s build timeout): the first failure writes a
        sentinel keyed to the source mtime, later attempts skip g++ until
        patchloader.cc changes."""
        from rcot_tpu.data import native

        src = tmp_path / "patchloader.cc"
        src.write_text("int broken(")
        monkeypatch.setattr(native, "_SRC_PATH", str(src))
        monkeypatch.setattr(native, "_LIB_PATH", str(tmp_path / "lib.so"))
        monkeypatch.setattr(native, "_FAIL_SENTINEL",
                            str(tmp_path / "lib.so.buildfail"))
        calls = []
        real_run = native.subprocess.run

        def counting_run(cmd, **kw):
            calls.append(cmd)
            return real_run(["false"], capture_output=True, text=True)

        monkeypatch.setattr(native.subprocess, "run", counting_run)
        native._maybe_build()
        assert len(calls) == 1
        assert os.path.exists(tmp_path / "lib.so.buildfail")
        native._maybe_build()  # sentinel hit: no second compile attempt
        assert len(calls) == 1
        # a changed source invalidates the sentinel
        os.utime(src, (os.path.getmtime(src) + 10,) * 2)
        native._maybe_build()
        assert len(calls) == 2

    def test_per_host_sharding_disjoint(self, fake_data):
        cfg = Config(data=fake_data, train=TrainConfig(batch_size=2))
        l0 = TrainLoader(cfg, seed=3, process_index=0, process_count=2)
        l1 = TrainLoader(cfg, seed=3, process_index=1, process_count=2)
        assert l0.steps_per_epoch() == l1.steps_per_epoch()
        b0 = next(iter(l0.epoch(1)))
        b1 = next(iter(l1.epoch(1)))
        assert not np.array_equal(b0.degraded, b1.degraded)


class TestNoiseCombine:
    def test_collapse_de_id_mapping(self):
        """noise_combine label collapse (reference util/dataset_utils.py:267-277):
        all denoise ids -> 0, paired ids shift down by 2."""
        from rcot_tpu.data.datasets import collapse_de_id
        assert [int(collapse_de_id(i)) for i in range(7)] == [0, 0, 0, 1, 2, 3, 4]
        arr = collapse_de_id(np.array([0, 1, 2, 3, 4, 5, 6]))
        assert arr.tolist() == [0, 0, 0, 1, 2, 3, 4]


class TestIndexDeterminism:
    def test_index_order_independent_of_listdir_order(self, fake_data,
                                                      monkeypatch):
        """The sample index order is the determinism/resume/multi-host
        contract (hosts take strided slices of one shuffled permutation of
        it) — so every os.listdir must be sorted: raw listing order is
        filesystem-dependent and differs across hosts/restarts."""
        import random

        from rcot_tpu.data import datasets as ds

        before = [s.degraded_path
                  for s in TrainIndex(fake_data, random.Random(0)).samples]
        real = os.listdir
        monkeypatch.setattr(ds.os, "listdir",
                            lambda p: list(reversed(real(p))))
        after = [s.degraded_path
                 for s in TrainIndex(fake_data, random.Random(0)).samples]
        assert before == after

    def test_too_small_image_names_the_file(self, fake_data, tmp_path):
        """An image smaller than the patch after the mod-crop must raise an
        error naming the FILE, not an anonymous 'empty range' from a worker
        thread."""
        import random

        from rcot_tpu.data.datasets import Sample

        small = str(tmp_path / "small.png")
        _write_img(small, h=24, w=24)
        with pytest.raises(ValueError, match="small.png"):
            get_patch_pair(Sample(small, small, 0), 32, 16, random.Random(0))
        # paired samples share (i, j) across both frames: a too-small CLEAN
        # image must name itself too, not die as an anonymous stack error
        big = str(tmp_path / "big.png")
        _write_img(big, h=64, w=64)
        with pytest.raises(ValueError, match="small.png"):
            get_patch_pair(Sample(big, small, 3), 32, 16, random.Random(0))


class TestDevicePrefetch:
    def test_prefetch_zero_passes_batches_through(self):
        """prefetch=0 must degrade to a pass-through iterator — it used to
        yield NOTHING (the fill loop ran zero times), silently training zero
        steps."""
        from rcot_tpu.data.pipeline import device_prefetch

        class B:
            def __init__(self, i):
                self.degraded = np.full((1,), i, np.float32)
                self.clean = self.degraded
                self.de_id = np.zeros((1,), np.int32)

        got = [int(d[0]) for d, _, _ in device_prefetch([B(i) for i in range(3)],
                                                        size=0)]
        assert got == [0, 1, 2]
