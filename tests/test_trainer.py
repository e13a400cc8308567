"""Trainer integration tests (CPU, tiny config): fit loop, fault injection,
step-exact recovery, sample dumps."""

import json
import os

import jax
import numpy as np
import pytest
from PIL import Image

from rcot_tpu.train.trainer import InjectedFailure, Trainer
from rcot_tpu.utils.config import (Config, CriticConfig, DataConfig,
                                   ModelConfig, TrainConfig)


@pytest.fixture(scope="module")
def data_tree(tmp_path_factory):
    root = tmp_path_factory.mktemp("tr")
    rng = np.random.default_rng(0)
    os.makedirs(f"{root}/Derain/rainy", exist_ok=True)
    os.makedirs(f"{root}/Derain/gt", exist_ok=True)
    os.makedirs(f"{root}/manifests/rainy", exist_ok=True)
    clean = rng.integers(0, 255, (64, 64, 3), dtype=np.uint8)
    rain = np.clip(clean.astype(int) + rng.integers(0, 60, clean.shape),
                   0, 255).astype(np.uint8)
    Image.fromarray(rain).save(f"{root}/Derain/rainy/rain-0.png")
    Image.fromarray(clean).save(f"{root}/Derain/gt/norain-0.png")
    with open(f"{root}/manifests/rainy/rainTrain.txt", "w") as f:
        f.write("rainy/rain-0.png\n")
    return str(root)


def make_cfg(data_tree, tmp_path, **train_overrides):
    defaults = dict(batch_size=2, num_epochs=1, log_every=1,
                    ckpt_dir=str(tmp_path / "ckpt"), run_name="T")
    defaults.update(train_overrides)
    return Config(
        model=ModelConfig(dim=8, num_blocks=(1, 1, 1, 1),
                          num_refinement_blocks=1, parity_params=False),
        critic=CriticConfig(patch_size=32),
        data=DataConfig(de_type=("derain",), patch_size=32,
                        data_file_dir=f"{data_tree}/manifests/",
                        derain_dir=f"{data_tree}/Derain/", num_workers=2,
                        oversample={"derain": 8, "denoise": 1, "deblur": 1,
                                    "lowlight": 1, "single": 1}),
        train=TrainConfig(**defaults),
    )


class TestTrainerLoop:
    def test_fit_trains_and_checkpoints(self, data_tree, tmp_path):
        cfg = make_cfg(data_tree, tmp_path)
        log = str(tmp_path / "log.jsonl")
        tr = Trainer(cfg, log_path=log)
        tr.fit()
        assert tr.host_step == 4  # 8 samples / batch 2
        ckpts = os.listdir(cfg.train.ckpt_dir)
        assert any(c.startswith("T_step4") for c in ckpts)
        events = [json.loads(l)["event"] for l in open(log)]
        assert "epoch_start" in events and "epoch_end" in events

    def test_fit_rejects_missing_eval_folder(self, data_tree, tmp_path):
        """A typo'd validation path must fail BEFORE training: the per-epoch
        validation runs before the epoch's checkpoint, so discovering the bad
        path at validation time loses the whole epoch (observed on a real
        15-epoch TPU run resumed with a wrong --tarset)."""
        cfg = make_cfg(data_tree, tmp_path)
        tr = Trainer(cfg, log_path=None)
        with pytest.raises(FileNotFoundError, match="eval_tarset"):
            tr.fit(eval_degset=f"{data_tree}/Derain/rainy",
                   eval_tarset=str(tmp_path / "no_such_dir"))
        assert tr.host_step == 0  # nothing trained
        # a forgotten --tarset (degset alone) is the same epoch-losing
        # failure and must also fail before training
        with pytest.raises(ValueError, match="together"):
            tr.fit(eval_degset=f"{data_tree}/Derain/rainy")
        assert tr.host_step == 0

    @pytest.mark.slow
    def test_eval_shape_mismatch_skips_loudly(self, data_tree, tmp_path):
        """A degraded/target pair with mismatched shapes is skipped like the
        reference does (trainer.py:195-196) but must be LOGGED: a mis-built
        val tree shrinking the eval set invisibly is exactly how round-3
        phase 4 lost its per-type eval (VERDICT r3 weak #6)."""
        from PIL import Image as _Image
        cfg = make_cfg(data_tree, tmp_path)
        log = str(tmp_path / "log.jsonl")
        tr = Trainer(cfg, log_path=log)
        tr.init_state()
        rng = np.random.default_rng(3)
        deg_dir, tar_dir = tmp_path / "vdeg", tmp_path / "vtar"
        os.makedirs(deg_dir)
        os.makedirs(tar_dir)
        # pair 0 matches; pair 1 is shape-mismatched
        for name, dshape, tshape in (("a.png", (32, 32), (32, 32)),
                                     ("b.png", (32, 32), (32, 48))):
            _Image.fromarray(rng.integers(0, 255, (*dshape, 3), dtype=np.uint8)
                             ).save(deg_dir / name)
            _Image.fromarray(rng.integers(0, 255, (*tshape, 3), dtype=np.uint8)
                             ).save(tar_dir / name)
        p = tr.evaluate_folder(str(deg_dir), str(tar_dir))
        assert np.isfinite(p)  # the matching pair still evaluated
        events = [json.loads(l) for l in open(log)]
        skips = [e for e in events if e["event"] == "eval_skip"]
        assert len(skips) == 1 and skips[0]["reason"] == "shape_mismatch"
        totals = [e for e in events if e["event"] == "eval_skipped_total"]
        assert totals and totals[0]["skipped"] == 1 and totals[0]["evaluated"] == 1

    @pytest.mark.slow
    def test_recovery_cycle(self, data_tree, tmp_path):
        """Fail mid-epoch, resume from the mid-epoch checkpoint, finish:
        the recovery path from SURVEY.md §5 (failure detection / resume)."""
        cfg = make_cfg(data_tree, tmp_path, fail_at_step=3, ckpt_every_steps=2)
        tr = Trainer(cfg, log_path=None)
        with pytest.raises(InjectedFailure):
            tr.fit()
        assert tr.host_step == 3

        ckpt = os.path.join(cfg.train.ckpt_dir, "latest.npz")
        cfg2 = make_cfg(data_tree, tmp_path, fail_at_step=-1, ckpt_every_steps=2)
        tr2 = Trainer(cfg2, log_path=None)
        tr2.resume(ckpt)
        assert tr2.host_step == 2  # mid-epoch ckpt was at step 2
        assert tr2.start_step == 2
        tr2.fit()
        assert tr2.host_step == 4  # completed the epoch, no rework of 0-1

    @pytest.mark.slow
    def test_preemption_checkpoints_and_resumes(self, data_tree, tmp_path):
        """SIGTERM-style preemption (TPU pods): the flag set by the signal
        handler makes the loop flush a resumable mid-epoch checkpoint at the
        next step boundary, log 'preempted', and return cleanly from fit()."""
        import signal

        cfg = make_cfg(data_tree, tmp_path)
        log = str(tmp_path / "log.jsonl")
        tr = Trainer(cfg, log_path=log)
        # deliver the signal the way the OS would, via the installed handler
        orig = signal.getsignal(signal.SIGTERM)
        restore = tr._install_preemption_handlers()
        try:
            assert signal.getsignal(signal.SIGTERM) is not orig
            os.kill(os.getpid(), signal.SIGTERM)
            import time
            time.sleep(0.05)  # let the handler run
            assert tr._preempted
            # second Ctrl-C is the escape hatch: raises instead of flagging
            with pytest.raises(KeyboardInterrupt):
                os.kill(os.getpid(), signal.SIGINT)
                time.sleep(0.2)
        finally:
            restore()
        assert signal.getsignal(signal.SIGTERM) is orig
        assert tr._preempted

        tr.fit()  # flag already set -> one step, checkpoint, clean stop
        assert tr.host_step == 1
        events = [json.loads(l)["event"] for l in open(log)]
        assert "preempted" in events
        ckpt = os.path.join(cfg.train.ckpt_dir, "latest.npz")
        assert os.path.exists(ckpt)

        cfg2 = make_cfg(data_tree, tmp_path)
        tr2 = Trainer(cfg2, log_path=None)
        tr2.resume(ckpt)
        assert tr2.start_step == 1
        tr2.fit()
        assert tr2.host_step == 4  # finished the epoch from the preempt point

    @pytest.mark.slow
    def test_periodic_ckpt_skips_when_write_in_flight(self, data_tree,
                                                      tmp_path, monkeypatch):
        """A slow background write must not stall the loop at the next
        periodic checkpoint — it is skipped and logged (the r5 capstone
        measured 50-90 s blocked per 300-step checkpoint under the old
        join-first backpressure)."""
        import time as _time

        from rcot_tpu.utils import checkpoint as ckpt_mod

        real_save = ckpt_mod.save_checkpoint

        def slow_save(path, state, **kw):
            _time.sleep(1.0)
            return real_save(path, state, **kw)

        monkeypatch.setattr(ckpt_mod, "save_checkpoint", slow_save)
        cfg = make_cfg(data_tree, tmp_path, ckpt_every_steps=1)
        log = str(tmp_path / "log.jsonl")
        tr = Trainer(cfg, log_path=log)
        tr.fit()
        events = [json.loads(l) for l in open(log)]
        skips = [e for e in events if e["event"] == "ckpt_skipped_inflight"]
        assert skips  # 4 steps x ckpt-every-1 vs a 1 s write: must skip
        # the end-of-epoch save still lands durably (fit waits on exit)
        assert os.path.exists(os.path.join(cfg.train.ckpt_dir, "latest.npz"))

    @pytest.mark.slow
    def test_resume_skips_already_logged_validation(self, data_tree,
                                                    tmp_path):
        """A relaunch resumed from a mid-epoch checkpoint of an epoch whose
        validation is ALREADY in the log must not re-run it: deterministic
        training reproduces the identical params/PSNR, and the r4 capstone
        paid 2-4 TPU-minutes per relay bounce re-proving that (VERDICT r4
        weak #5 — every epoch's validation appeared twice)."""
        deg = f"{data_tree}/Derain/rainy"
        tar = f"{data_tree}/Derain/rainy"  # same-shape folder; value unused
        log = str(tmp_path / "log.jsonl")
        cfg = make_cfg(data_tree, tmp_path, ckpt_every_steps=3)
        tr = Trainer(cfg, log_path=log)
        tr.fit(eval_degset=deg, eval_tarset=tar)  # validates epoch 1
        # simulate the kill window between validation and the end-of-epoch
        # save landing: resume from the PERIODIC mid-epoch checkpoint
        ckpt = os.path.join(cfg.train.ckpt_dir, "T_step3.npz")
        assert os.path.exists(ckpt)
        tr2 = Trainer(make_cfg(data_tree, tmp_path, ckpt_every_steps=3),
                      log_path=log)
        tr2.resume(ckpt)
        assert tr2._validated_epochs == {1: deg}
        assert tr2._resume_config_ok
        tr2.fit(eval_degset=deg, eval_tarset=tar)
        assert tr2.host_step == 4  # finished the epoch
        events = [json.loads(l) for l in open(log)]
        vals = [e for e in events if e["event"] == "validation"]
        assert len(vals) == 1 and vals[0]["epoch"] == 1
        skips = [e for e in events if e["event"] == "validation_skipped"]
        assert len(skips) == 1 and skips[0]["epoch"] == 1

        # a DIFFERENT eval folder must NOT inherit the logged validation:
        # the skip is keyed on (config hash, degset), review r5 finding
        tar2 = f"{data_tree}/Derain/gt"
        tr3 = Trainer(make_cfg(data_tree, tmp_path, ckpt_every_steps=3),
                      log_path=log)
        tr3.resume(ckpt)
        tr3.fit(eval_degset=tar2, eval_tarset=tar2)
        events = [json.loads(l) for l in open(log)]
        vals2 = [e for e in events if e["event"] == "validation"
                 and e.get("degset") == tar2]
        assert len(vals2) == 1  # re-measured, not skipped

    @pytest.mark.slow
    def test_fit_with_data_parallel_mesh(self, data_tree, tmp_path):
        """Trainer end-to-end over a 4-device 'data' mesh: replicated state,
        sharded batches, gradient all-reduce inserted by XLA."""
        import jax

        from rcot_tpu.parallel.sharding import make_mesh
        cfg = make_cfg(data_tree, tmp_path, batch_size=4)
        mesh = make_mesh(data=4, devices=jax.devices()[:4])
        tr = Trainer(cfg, mesh=mesh, log_path=None)
        tr.fit()
        assert tr.host_step == 2  # 8 samples / batch 4
        leaf = jax.tree_util.tree_leaves(tr.state.t_params)[0]
        assert len(leaf.devices()) == 4  # replicated across the mesh

    @pytest.mark.slow
    def test_resume_single_device_ckpt_onto_mesh(self, data_tree, tmp_path):
        """A checkpoint written single-device resumes onto a data mesh
        (replication happens at resume, then training proceeds)."""
        import jax

        from rcot_tpu.parallel.sharding import make_mesh
        cfg = make_cfg(data_tree, tmp_path, batch_size=2)
        tr = Trainer(cfg, log_path=None)
        tr.fit()
        ckpt = os.path.join(cfg.train.ckpt_dir, "latest.npz")

        cfg2 = make_cfg(data_tree, tmp_path, batch_size=2, num_epochs=2)
        mesh = make_mesh(data=2, devices=jax.devices()[:2])
        tr2 = Trainer(cfg2, mesh=mesh, log_path=None)
        tr2.resume(ckpt)
        tr2.fit()  # epoch 2 on the mesh
        assert tr2.host_step == 8
        leaf = jax.tree_util.tree_leaves(tr2.state.t_params)[0]
        assert len(leaf.devices()) == 2

    @pytest.mark.slow
    def test_sample_dump(self, data_tree, tmp_path):
        cfg = make_cfg(data_tree, tmp_path, sample_every=1,
                       sample_dir=str(tmp_path / "samples"))
        tr = Trainer(cfg, log_path=None)
        tr.fit()
        files = os.listdir(os.path.join(cfg.train.sample_dir, "T"))
        assert {"epoch1_output.png", "epoch1_degraded.png",
                "epoch1_target.png", "epoch1_res.png"} <= set(files)


class TestAutoComposition:
    """Batch>=8 trainers on TPU default to the measured-optimal
    gram+FULL+bf16 composition (BENCH.md round 4) with a compile-failure
    fallback to the safe default; CPU / small-batch / user-set env are
    never touched."""

    def test_no_auto_small_batch_or_cpu(self, data_tree, tmp_path,
                                        monkeypatch):
        from rcot_tpu.ops import dispatch
        from rcot_tpu.train import trainer as trmod
        monkeypatch.delenv("RCOT_PALLAS", raising=False)
        dispatch.pallas_enabled.cache_clear()
        try:
            assert trmod._apply_auto_composition(
                make_cfg(data_tree, tmp_path)) == {}            # batch 2
            assert trmod._apply_auto_composition(
                make_cfg(data_tree, tmp_path, batch_size=8)) == {}  # cpu
        finally:
            dispatch.clear_auto()
            dispatch.pallas_enabled.cache_clear()
        assert "RCOT_PALLAS_BLOCK" not in os.environ

    def test_auto_respects_user_env(self, data_tree, tmp_path, monkeypatch):
        from rcot_tpu.ops import dispatch
        from rcot_tpu.train import trainer as trmod
        monkeypatch.setenv("RCOT_PALLAS", "1")
        monkeypatch.setenv("RCOT_BWD_BF16", "0")  # user pinned fp32
        monkeypatch.delenv("RCOT_PALLAS_BLOCK", raising=False)
        dispatch.pallas_enabled.cache_clear()
        try:
            auto = trmod._apply_auto_composition(
                make_cfg(data_tree, tmp_path, batch_size=8))
            assert auto == {"RCOT_PALLAS_BLOCK": "full"}
            # the choice lives in the dispatch channel, NOT os.environ
            # (advisor r4 medium: env mutation leaked across trainers)
            assert dispatch.auto_overrides() == {"RCOT_PALLAS_BLOCK": "full"}
            assert "RCOT_PALLAS_BLOCK" not in os.environ
            assert os.environ["RCOT_BWD_BF16"] == "0"  # untouched
            # and the kernels resolve it: user env wins, auto fills unset
            assert dispatch.resolved_env("RCOT_BWD_BF16") == "0"
            assert dispatch.resolved_env("RCOT_PALLAS_BLOCK") == "full"
            assert dispatch.block_mode() == "full"
        finally:
            dispatch.clear_auto()
            dispatch.pallas_enabled.cache_clear()

    def test_auto_off_switch(self, data_tree, tmp_path, monkeypatch):
        from rcot_tpu.ops import dispatch
        from rcot_tpu.train import trainer as trmod
        monkeypatch.setenv("RCOT_PALLAS", "1")
        monkeypatch.setenv("RCOT_AUTO_COMPOSITION", "0")
        dispatch.pallas_enabled.cache_clear()
        try:
            assert trmod._apply_auto_composition(
                make_cfg(data_tree, tmp_path, batch_size=8)) == {}
        finally:
            dispatch.clear_auto()
            dispatch.pallas_enabled.cache_clear()

    def test_later_small_batch_trainer_resets_stale_auto(
            self, data_tree, tmp_path, monkeypatch):
        """A batch-8 trainer's auto choice must NOT survive into a later
        batch-3-class trainer in the same process (advisor r4 medium: with
        env mutation, the b3 trainer saw FULL as if user-set, _auto_env
        stayed empty, and the compile-failure fallback never engaged)."""
        from rcot_tpu.ops import dispatch
        from rcot_tpu.train import trainer as trmod
        monkeypatch.setenv("RCOT_PALLAS", "1")
        monkeypatch.delenv("RCOT_PALLAS_BLOCK", raising=False)
        monkeypatch.delenv("RCOT_BWD_BF16", raising=False)
        dispatch.pallas_enabled.cache_clear()
        try:
            auto8 = trmod._apply_auto_composition(
                make_cfg(data_tree, tmp_path, batch_size=8))
            assert set(auto8) == {"RCOT_PALLAS_BLOCK", "RCOT_BWD_BF16"}
            assert dispatch.auto_overrides() == auto8
            # second trainer at small batch: returns {} AND resets the channel
            assert trmod._apply_auto_composition(
                make_cfg(data_tree, tmp_path, batch_size=2)) == {}
            assert dispatch.auto_overrides() == {}
            assert dispatch.block_mode() == "tail"  # back to the safe default
        finally:
            dispatch.clear_auto()
            dispatch.pallas_enabled.cache_clear()

    def test_auto_never_reaches_inference_scope(self, data_tree, tmp_path,
                                                monkeypatch):
        """The auto choice dodges a BACKWARD co-compile wall; forward-only
        traces resolve their own composition. Also: an explicit
        RCOT_INFER_BLOCK outranks an explicit RCOT_PALLAS_BLOCK inside
        inference scope (advisor r4 low #3)."""
        from rcot_tpu.ops import dispatch
        monkeypatch.setenv("RCOT_PALLAS", "1")
        monkeypatch.delenv("RCOT_PALLAS_BLOCK", raising=False)
        dispatch.pallas_enabled.cache_clear()
        try:
            dispatch.set_auto({"RCOT_PALLAS_BLOCK": "head",
                               "RCOT_BWD_BF16": "all"})
            with dispatch.inference_scope():
                assert dispatch.block_mode() == "full"  # not the auto "head"
                assert dispatch.resolved_env("RCOT_BWD_BF16", "0") == "0"
            # explicit user env: the scope-specific key wins in-scope
            monkeypatch.setenv("RCOT_PALLAS_BLOCK", "full")
            monkeypatch.setenv("RCOT_INFER_BLOCK", "tail")
            with dispatch.inference_scope():
                assert dispatch.block_mode() == "tail"
            assert dispatch.block_mode() == "full"  # outside: user env
        finally:
            dispatch.clear_auto()
            dispatch.pallas_enabled.cache_clear()

    def test_compile_failure_falls_back_and_logs(self, data_tree, tmp_path,
                                                 monkeypatch):
        from rcot_tpu.ops import dispatch
        from rcot_tpu.train import trainer as trmod
        monkeypatch.setenv("RCOT_PALLAS", "1")
        monkeypatch.delenv("RCOT_PALLAS_BLOCK", raising=False)
        monkeypatch.delenv("RCOT_BWD_BF16", raising=False)
        dispatch.pallas_enabled.cache_clear()

        def fake_jitted(cfg):
            if dispatch.resolved_env("RCOT_PALLAS_BLOCK") == "full":
                def bad(*a):
                    raise RuntimeError(
                        "INTERNAL: http://127.0.0.1:8103/remote_compile: "
                        "HTTP 500: tpu_compile_helper subprocess exit code 1")
                return (bad, None)
            return ((lambda *a: "safe-result"), None)

        monkeypatch.setattr(trmod, "_jitted_steps", fake_jitted)
        log = str(tmp_path / "fallback.jsonl")
        tr = trmod.Trainer(make_cfg(data_tree, tmp_path, batch_size=8),
                           log_path=log)
        try:
            assert tr._step() == "safe-result"
            # the STAGED ladder stops at the first compiling stage:
            # bf16-only (gram+TAIL+bf16 beats tail fp32 at b8, BENCH r4)
            assert dispatch.auto_overrides() == {"RCOT_BWD_BF16": "all"}
            assert tr._auto_env == {"RCOT_BWD_BF16": "all"}
        finally:
            dispatch.clear_auto()
            dispatch.pallas_enabled.cache_clear()
        events = [json.loads(l)["event"] for l in open(log)]
        assert events.count("composition_fallback") == 1

    def test_compile_failure_ladder_falls_through_to_default(
            self, data_tree, tmp_path, monkeypatch):
        """When the bf16-only middle stage also fails to compile, the
        ladder lands on the shipped safe default ({})."""
        from rcot_tpu.ops import dispatch
        from rcot_tpu.train import trainer as trmod
        monkeypatch.setenv("RCOT_PALLAS", "1")
        monkeypatch.delenv("RCOT_PALLAS_BLOCK", raising=False)
        monkeypatch.delenv("RCOT_BWD_BF16", raising=False)
        dispatch.pallas_enabled.cache_clear()

        def fake_jitted(cfg):
            if dispatch.auto_overrides():  # any auto stage fails
                def bad(*a):
                    raise RuntimeError(
                        "Mosaic lowering failed in remote_compile")
                return (bad, None)
            return ((lambda *a: "default-result"), None)

        monkeypatch.setattr(trmod, "_jitted_steps", fake_jitted)
        log = str(tmp_path / "fallback2.jsonl")
        tr = trmod.Trainer(make_cfg(data_tree, tmp_path, batch_size=8),
                           log_path=log)
        try:
            assert tr._step() == "default-result"
            assert dispatch.auto_overrides() == {}
            assert tr._auto_env == {}
        finally:
            dispatch.clear_auto()
            dispatch.pallas_enabled.cache_clear()
        events = [json.loads(l) for l in open(log)]
        fallbacks = [e for e in events if e["event"] == "composition_fallback"]
        assert len(fallbacks) == 2  # full+bf16 -> bf16 -> {}
        assert fallbacks[0]["dropped"] == ["RCOT_PALLAS_BLOCK"]
        assert fallbacks[1]["dropped"] == ["RCOT_BWD_BF16"]

    def test_non_compile_error_propagates(self, data_tree, tmp_path,
                                          monkeypatch):
        from rcot_tpu.ops import dispatch
        from rcot_tpu.train import trainer as trmod
        monkeypatch.setenv("RCOT_PALLAS", "1")
        monkeypatch.delenv("RCOT_PALLAS_BLOCK", raising=False)
        monkeypatch.delenv("RCOT_BWD_BF16", raising=False)
        dispatch.pallas_enabled.cache_clear()

        def fake_jitted(cfg):
            def bad(*a):
                raise FloatingPointError("nan in gradients")
            return (bad, None)

        monkeypatch.setattr(trmod, "_jitted_steps", fake_jitted)
        tr = trmod.Trainer(make_cfg(data_tree, tmp_path, batch_size=8),
                           log_path=None)
        try:
            with pytest.raises(FloatingPointError):
                tr._step()
        finally:
            dispatch.clear_auto()
            dispatch.pallas_enabled.cache_clear()

    def test_runtime_internal_error_propagates(self, data_tree, tmp_path,
                                               monkeypatch):
        """A RUNTIME 'XlaRuntimeError: INTERNAL' (no compile-phase marker)
        must NOT be swallowed into a composition fallback (VERDICT r4 weak
        #4: the old broad match would silently retrain the whole run on the
        slow composition instead of surfacing the error)."""
        from rcot_tpu.ops import dispatch
        from rcot_tpu.train import trainer as trmod
        monkeypatch.setenv("RCOT_PALLAS", "1")
        monkeypatch.delenv("RCOT_PALLAS_BLOCK", raising=False)
        monkeypatch.delenv("RCOT_BWD_BF16", raising=False)
        dispatch.pallas_enabled.cache_clear()

        class XlaRuntimeError(RuntimeError):
            pass

        def fake_jitted(cfg):
            def bad(*a):
                raise XlaRuntimeError("INTERNAL: Accelerator device halted")
            return (bad, None)

        monkeypatch.setattr(trmod, "_jitted_steps", fake_jitted)
        tr = trmod.Trainer(make_cfg(data_tree, tmp_path, batch_size=8),
                           log_path=None)
        try:
            with pytest.raises(XlaRuntimeError, match="halted"):
                tr._step()
        finally:
            dispatch.clear_auto()
            dispatch.pallas_enabled.cache_clear()

    def test_fallback_retry_deleted_array_chains_original(
            self, data_tree, tmp_path, monkeypatch):
        """If the 'compile' failure actually fired during first execution
        (donation already consumed the buffers), the retry hits 'Array has
        been deleted' — the surfaced error must be the ORIGINAL compile-
        phase one, with the deleted-array error chained as context
        (advisor r4 low #2)."""
        from rcot_tpu.ops import dispatch
        from rcot_tpu.train import trainer as trmod
        monkeypatch.setenv("RCOT_PALLAS", "1")
        monkeypatch.delenv("RCOT_PALLAS_BLOCK", raising=False)
        monkeypatch.delenv("RCOT_BWD_BF16", raising=False)
        dispatch.pallas_enabled.cache_clear()

        def fake_jitted(cfg):
            if dispatch.resolved_env("RCOT_PALLAS_BLOCK") == "full":
                def bad(*a):
                    raise RuntimeError(
                        "INTERNAL: remote_compile: HTTP 500: "
                        "tpu_compile_helper subprocess exit code 1")
                return (bad, None)

            def deleted(*a):
                raise RuntimeError(
                    "Array has been deleted with shape=float32[1,1,96,96].")
            return (deleted, None)

        monkeypatch.setattr(trmod, "_jitted_steps", fake_jitted)
        tr = trmod.Trainer(make_cfg(data_tree, tmp_path, batch_size=8),
                           log_path=str(tmp_path / "fb.jsonl"))
        try:
            with pytest.raises(RuntimeError, match="remote_compile") as ei:
                tr._step()
            assert "deleted" in repr(ei.value.__cause__)
        finally:
            dispatch.clear_auto()
            dispatch.pallas_enabled.cache_clear()

    def test_auto_keys_on_per_chip_batch_under_mesh(self, data_tree,
                                                    tmp_path, monkeypatch):
        """global batch 16 over a data=8 mesh is per-chip batch 2 — the
        compiler sees the small shape, so no auto composition applies."""
        import jax as _jax

        from rcot_tpu.ops import dispatch
        from rcot_tpu.parallel.sharding import make_mesh
        from rcot_tpu.train import trainer as trmod
        monkeypatch.setenv("RCOT_PALLAS", "1")
        monkeypatch.delenv("RCOT_PALLAS_BLOCK", raising=False)
        monkeypatch.delenv("RCOT_BWD_BF16", raising=False)
        dispatch.pallas_enabled.cache_clear()
        mesh = make_mesh(data=8, devices=_jax.devices()[:8])
        cfg = make_cfg(data_tree, tmp_path, batch_size=16)
        try:
            assert trmod._apply_auto_composition(cfg, mesh) == {}
            # no mesh: global 16 IS the per-chip batch -> auto applies
            auto = trmod._apply_auto_composition(cfg, None)
            assert set(auto) == {"RCOT_PALLAS_BLOCK", "RCOT_BWD_BF16"}
        finally:
            dispatch.clear_auto()
            dispatch.pallas_enabled.cache_clear()
