"""Checkpoint store tests: atomic write, exact round-trip, keep-N, resume."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rcot_tpu.utils.checkpoint import load_checkpoint, save_checkpoint


def _state(seed=0):
    k = jax.random.PRNGKey(seed)
    return {
        "t_params": {"w": jax.random.normal(k, (4, 3)), "layers": [
            {"a": jnp.ones((2,))}, {"a": jnp.zeros((2,))}]},
        "step": jnp.int32(17),
        "key": jax.random.PRNGKey(5),
    }


class TestCheckpoint:
    def test_roundtrip_exact(self, tmp_path):
        s = _state()
        path = save_checkpoint(str(tmp_path / "ckpt_step17"), s,
                               metadata={"epoch": 3})
        loaded, meta = load_checkpoint(path, jax.tree_util.tree_map(
            lambda x: jnp.zeros_like(x), s))
        assert meta["epoch"] == 3
        for a, b in zip(jax.tree_util.tree_leaves(s),
                        jax.tree_util.tree_leaves(loaded)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_extra_leaves_in_checkpoint_are_ignored(self, tmp_path):
        """Loading is template-driven: npz keys absent from the template are
        skipped. This is the compat contract that lets checkpoints written
        when TrainState still carried an in-state `epoch` leaf (removed —
        the epoch lives in metadata) load into today's structure."""
        s = _state()
        legacy = dict(s, epoch=jnp.int32(7))  # the removed leaf
        path = save_checkpoint(str(tmp_path / "old_step17"), legacy,
                               metadata={"epoch": 7})
        loaded, meta = load_checkpoint(path, jax.tree_util.tree_map(
            lambda x: jnp.zeros_like(x), s))
        assert meta["epoch"] == 7
        assert "epoch" not in loaded
        for a, b in zip(jax.tree_util.tree_leaves(s),
                        jax.tree_util.tree_leaves(loaded)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_latest_symlink(self, tmp_path):
        save_checkpoint(str(tmp_path / "run_step1"), _state(1))
        save_checkpoint(str(tmp_path / "run_step2"), _state(2))
        latest = tmp_path / "latest.npz"
        assert latest.is_symlink()
        loaded, _ = load_checkpoint(str(latest), _state(0))
        want = jax.tree_util.tree_leaves(_state(2))
        got = jax.tree_util.tree_leaves(loaded)
        for a, b in zip(want, got):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_keep_n_prunes(self, tmp_path):
        for i in range(5):
            save_checkpoint(str(tmp_path / f"run_step{i}"), _state(i), keep_n=2)
        files = sorted(f for f in os.listdir(tmp_path)
                       if f.startswith("run_step"))
        assert len(files) == 2

    def test_keep_n_prunes_numerically(self, tmp_path):
        """Pruning must keep the NEWEST steps across digit boundaries —
        lexicographic ordering would delete step112 while keeping step80
        (and leave latest.npz dangling, as observed on a real 15-epoch run)."""
        for i in (80, 88, 96, 104, 112):
            save_checkpoint(str(tmp_path / f"run_step{i}"), _state(i), keep_n=3)
        files = sorted(f for f in os.listdir(tmp_path)
                       if f.startswith("run_step"))
        assert files == ["run_step104.npz", "run_step112.npz", "run_step96.npz"]
        latest = tmp_path / "latest.npz"
        assert latest.exists() and os.path.basename(
            os.readlink(latest)) == "run_step112.npz"

    def test_keep_n_never_prunes_the_fresh_write(self, tmp_path):
        """Stale HIGHER-step files from a previous run in the same dir must
        not make pruning delete the checkpoint just written (latest.npz
        points at it)."""
        for i in (500, 510):
            save_checkpoint(str(tmp_path / f"run_step{i}"), _state(i))
        path = save_checkpoint(str(tmp_path / "run_step1"), _state(1), keep_n=1)
        assert os.path.exists(path)
        latest = tmp_path / "latest.npz"
        assert os.path.basename(os.readlink(latest)) == "run_step1.npz"

    def test_shape_mismatch_raises(self, tmp_path):
        path = save_checkpoint(str(tmp_path / "c"), {"w": jnp.ones((2, 2))})
        with pytest.raises(ValueError, match="shape mismatch"):
            load_checkpoint(path, {"w": jnp.ones((3, 3))})

    def test_missing_leaf_raises(self, tmp_path):
        path = save_checkpoint(str(tmp_path / "c"), {"w": jnp.ones((2,))})
        with pytest.raises(KeyError):
            load_checkpoint(path, {"w": jnp.ones((2,)), "extra": jnp.ones((1,))})


class TestConfigHash:
    """The resume-compat hash covers training SEMANTICS, not IO sinks —
    relocating the checkpoint dir (the standard preemption-recovery move on
    this sandbox's wiped /tmp) must not trip resume_config_mismatch."""

    def test_io_sink_fields_do_not_change_hash(self):
        import dataclasses

        from rcot_tpu.utils.config import Config

        a = Config()
        b = a.replace(train=dataclasses.replace(
            a.train, ckpt_dir="/elsewhere/ckpt", sample_dir="/elsewhere/s"))
        assert a.hash() == b.hash()

    def test_semantic_fields_do_change_hash(self):
        import dataclasses

        from rcot_tpu.utils.config import Config

        a = Config()
        c = a.replace(train=dataclasses.replace(a.train, lr=5e-4))
        d = a.replace(data=dataclasses.replace(a.data, patch_size=64))
        assert a.hash() != c.hash() and a.hash() != d.hash()

    def test_legacy_hash_accepted_on_resume(self, tmp_path):
        """Checkpoints written before the IO-sink exclusion store the
        old-scheme (all-fields) hash; resuming them with an identical
        config must NOT log resume_config_mismatch (advisor r3)."""
        import json

        import jax

        from rcot_tpu.train.steps import create_train_state
        from rcot_tpu.train.trainer import Trainer
        from rcot_tpu.utils.checkpoint import save_checkpoint
        from rcot_tpu.utils.config import (Config, CriticConfig, DataConfig,
                                           ModelConfig, TrainConfig)

        import os

        import numpy as np
        from PIL import Image

        root = tmp_path / "tr"
        os.makedirs(root / "Derain" / "rainy")
        os.makedirs(root / "Derain" / "gt")
        os.makedirs(root / "manifests" / "rainy")
        rng = np.random.default_rng(0)
        Image.fromarray(rng.integers(0, 255, (64, 64, 3), dtype=np.uint8)
                        ).save(root / "Derain" / "rainy" / "rain-0.png")
        Image.fromarray(rng.integers(0, 255, (64, 64, 3), dtype=np.uint8)
                        ).save(root / "Derain" / "gt" / "norain-0.png")
        (root / "manifests" / "rainy" / "rainTrain.txt").write_text(
            "rainy/rain-0.png\n")
        cfg = Config(
            model=ModelConfig(dim=8, num_blocks=(1, 1, 1, 1),
                              num_refinement_blocks=1, parity_params=False),
            critic=CriticConfig(patch_size=32),
            data=DataConfig(de_type=("derain",), patch_size=32,
                            data_file_dir=str(root / "manifests") + "/",
                            derain_dir=str(root / "Derain") + "/"),
            train=TrainConfig(batch_size=2,
                              ckpt_dir=str(tmp_path / "ckpt")))
        assert cfg.hash_legacy() != cfg.hash()
        state = create_train_state(jax.random.PRNGKey(0), cfg)
        path = save_checkpoint(
            str(tmp_path / "old_step0"), state,
            metadata={"epoch": 1, "step": 0, "config": cfg.to_dict(),
                      "config_hash": cfg.hash_legacy()})
        log = str(tmp_path / "log.jsonl")
        tr = Trainer(cfg, log_path=log)
        tr.resume(path)
        events = [json.loads(l)["event"] for l in open(log)]
        assert "resume_config_mismatch" not in events
        assert "resumed" in events


class TestAsyncCheckpointer:
    """Background-thread saves (trainer's default write path): content parity
    with the sync writer, donation safety, in-order keep-N, error surfacing."""

    def test_async_matches_sync(self, tmp_path):
        from rcot_tpu.utils.checkpoint import AsyncCheckpointer

        s = _state(3)
        sync_path = save_checkpoint(str(tmp_path / "sync_step17"), s,
                                    metadata={"epoch": 4}, keep_n=2)
        ac = AsyncCheckpointer()
        async_path = ac.save(str(tmp_path / "async_step17"), s,
                             metadata={"epoch": 4}, keep_n=2)
        ac.wait()
        tpl = jax.tree_util.tree_map(lambda x: jnp.zeros_like(x), s)
        a, meta_a = load_checkpoint(sync_path, tpl)
        b, meta_b = load_checkpoint(async_path, tpl)
        assert meta_a == meta_b
        for x, y in zip(jax.tree_util.tree_leaves(a),
                        jax.tree_util.tree_leaves(b)):
            np.testing.assert_array_equal(np.asarray(x), np.asarray(y))

    def test_donation_safety(self, tmp_path):
        """save() must snapshot the state BEFORE the next donating step
        reuses its buffers: the checkpoint equals the state at save time,
        not whatever the training loop mutated it into afterwards."""
        from rcot_tpu.utils.checkpoint import AsyncCheckpointer

        @jax.jit
        def plain_step(s):
            return {"w": s["w"] + 1.0}

        step = jax.jit(plain_step, donate_argnums=(0,))
        s = {"w": jnp.zeros((256, 256))}
        s = step(s)  # w == 1
        want = np.asarray(s["w"]).copy()
        ac = AsyncCheckpointer()
        path = ac.save(str(tmp_path / "don_step1"), s)
        for _ in range(4):  # donates (and thus invalidates) the saved buffers
            s = step(s)
        ac.wait()
        loaded, _ = load_checkpoint(path, {"w": jnp.zeros((256, 256))})
        np.testing.assert_array_equal(np.asarray(loaded["w"]), want)
        assert float(s["w"][0, 0]) == 5.0

    def test_in_order_keep_n(self, tmp_path):
        from rcot_tpu.utils.checkpoint import AsyncCheckpointer

        ac = AsyncCheckpointer()
        for i in range(5):  # back-to-back: each save joins the previous
            ac.save(str(tmp_path / f"run_step{i}"), _state(i), keep_n=2)
        ac.wait()
        files = sorted(f for f in os.listdir(tmp_path)
                       if f.startswith("run_step"))
        assert files == ["run_step3.npz", "run_step4.npz"]
        loaded, _ = load_checkpoint(str(tmp_path / "latest.npz"), _state(0))
        for a, b in zip(jax.tree_util.tree_leaves(_state(4)),
                        jax.tree_util.tree_leaves(loaded)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_skip_if_busy_drops_instead_of_blocking(self, tmp_path,
                                                    monkeypatch):
        """Periodic-save semantics: when a write is in flight, skip_if_busy
        returns None immediately instead of joining it. The r5 capstone
        measured 50-90 s stalls at EVERY 300-step checkpoint because the
        620 MB tunnel write outlives the compute window and the old
        backpressure turned async saves synchronous."""
        import threading
        import time

        from rcot_tpu.utils import checkpoint as ckpt_mod
        from rcot_tpu.utils.checkpoint import AsyncCheckpointer

        release = threading.Event()
        real_save = ckpt_mod.save_checkpoint

        def slow_save(path, state, **kw):
            release.wait(timeout=30)
            return real_save(path, state, **kw)

        monkeypatch.setattr(ckpt_mod, "save_checkpoint", slow_save)
        ac = AsyncCheckpointer()
        first = ac.save(str(tmp_path / "s_step0"), _state(0))
        assert ac.busy
        t0 = time.perf_counter()
        skipped = ac.save(str(tmp_path / "s_step1"), _state(1),
                          skip_if_busy=True)
        assert skipped is None
        assert time.perf_counter() - t0 < 5  # returned without joining
        release.set()
        ac.wait()
        assert not ac.busy
        assert os.path.exists(first)
        assert not os.path.exists(str(tmp_path / "s_step1.npz"))
        # idle again: skip_if_busy saves normally
        assert ac.save(str(tmp_path / "s_step2"), _state(2),
                       skip_if_busy=True) is not None
        ac.wait()
        assert os.path.exists(str(tmp_path / "s_step2.npz"))

    def test_worker_error_reraises(self, tmp_path):
        from rcot_tpu.utils.checkpoint import AsyncCheckpointer

        ac = AsyncCheckpointer()
        blocker = tmp_path / "blocker"
        blocker.write_text("not a directory")  # parent path is a FILE
        ac.save(str(blocker / "x_step0"), _state())
        with pytest.raises(OSError):  # NotADirectoryError/FileExistsError
            ac.wait()
        # the checkpointer recovers: a later save works and wait() is clean
        ok = ac.save(str(tmp_path / "ok_step0"), _state())
        ac.wait()
        assert os.path.exists(ok)
