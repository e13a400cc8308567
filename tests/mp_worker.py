"""Worker for the 2-process jax.distributed test (tests/test_multiprocess.py).

Each process: 2 virtual CPU devices -> a 4-device global 'data' mesh across
2 controllers. Runs a real Trainer epoch on a synthetic derain tree with
per-host data sharding, then a checkpoint save — asserting multi-host
semantics from inside the process:
- device/process counts;
- the loader's per-host strided split (disjoint halves);
- replicated state + per-host batches -> identical post-epoch params on
  every process (XLA's gradient all-reduce across controllers);
- process-0-only checkpoint writes (each process gets its OWN ckpt dir; the
  non-lead's must stay empty).

Resume mode (cross-process-count resume, the one resume topology the
single-process tests can't cover): pass a checkpoint path and the worker
resumes it and trains ONE more epoch, dumping its post-epoch params. The
test runs this both 2-process (2 devices x batch 2 per host) and
1-process (4 devices x batch 4) from the SAME checkpoint and asserts the
continuations match: the global batch content is topology-invariant here
because augment/degrade run on-device keyed by the GLOBAL step
(trainer.py _fused_step) and the tree's single 32x32 image makes host-side
crop randomness (which IS per-host) a no-op.

Invoked: python tests/mp_worker.py <pid> <nproc> <coordinator> <tree> <out>
                 [n_local_devices] [batch_size] [resume_from]
"""

import json
import os
import sys


def main():
    pid, nproc = int(sys.argv[1]), int(sys.argv[2])
    coord, tree, outdir = sys.argv[3], sys.argv[4], sys.argv[5]
    n_local = int(sys.argv[6]) if len(sys.argv) > 6 else 2
    batch = int(sys.argv[7]) if len(sys.argv) > 7 else 2
    resume_from = sys.argv[8] if len(sys.argv) > 8 else None

    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + f" --xla_force_host_platform_device_count={n_local}").strip()
    import jax
    jax.config.update("jax_platforms", "cpu")  # axon sitecustomize stomps env

    from rcot_tpu.parallel.sharding import initialize_distributed, make_mesh
    initialize_distributed(coord, nproc, pid)
    assert jax.process_index() == pid
    assert jax.process_count() == nproc, jax.process_count()
    assert jax.local_device_count() == n_local
    assert jax.device_count() == n_local * nproc

    from rcot_tpu.train.trainer import Trainer
    from rcot_tpu.utils.config import (Config, CriticConfig, DataConfig,
                                       ModelConfig, TrainConfig)

    cfg = Config(
        model=ModelConfig(dim=8, num_blocks=(1, 1, 1, 1),
                          num_refinement_blocks=1, parity_params=False),
        critic=CriticConfig(patch_size=32),
        data=DataConfig(de_type=("derain",), patch_size=32,
                        data_file_dir=f"{tree}/manifests/",
                        derain_dir=f"{tree}/Derain/", num_workers=2,
                        oversample={"derain": 8, "denoise": 1, "deblur": 1,
                                    "lowlight": 1, "single": 1}),
        # per-host batch x nproc = global batch 4 over the global mesh
        train=TrainConfig(batch_size=batch, num_epochs=1, log_every=1,
                          ckpt_dir=os.path.join(outdir, f"ckpt_p{pid}"),
                          run_name="MP"),
    )

    mesh = make_mesh()  # all global devices on 'data'
    trainer = Trainer(cfg, mesh=mesh,
                      log_path=os.path.join(outdir, f"log_p{pid}.jsonl"))
    assert trainer.is_lead == (pid == 0)

    # loader split: 8 oversampled samples, strided by process,
    # always 2 global steps per epoch
    assert trainer.loader.pi == pid and trainer.loader.pc == nproc
    assert trainer.loader.steps_per_epoch() == 2

    if resume_from is not None:
        import numpy as np
        trainer.resume(resume_from)
        assert trainer.host_step == 2 and trainer.start_epoch == 2
        trainer.train_epoch(trainer.start_epoch)
        assert trainer.host_step == 4
        jax.block_until_ready(trainer.state)
        leaves = jax.tree_util.tree_leaves(trainer.state.t_params)
        f_leaves = jax.tree_util.tree_leaves(trainer.state.f_params)
        if pid == 0:
            np.savez(os.path.join(outdir, f"resumed_np{nproc}.npz"),
                     *[np.asarray(l) for l in leaves + f_leaves])
        print(f"resume worker {pid} OK", flush=True)
        return

    trainer.init_state()
    metrics = trainer.train_epoch(1)
    assert trainer.host_step == 2

    # direct save() outside fit(): must block — the default async path
    # returns before the npz lands (fit() flushes on exit; we have no fit)
    ckpt_path = trainer.save(epoch=2, blocking=True)
    wrote = os.path.exists(ckpt_path)
    assert wrote == (pid == 0), (pid, ckpt_path)

    # params must be bitwise-identical across processes (replicated state,
    # all-reduced grads). Fully-replicated global arrays convert locally.
    import numpy as np
    leaves = jax.tree_util.tree_leaves(trainer.state.t_params)
    checksum = float(sum(np.float64(np.asarray(l).sum()) for l in leaves))
    f_leaves = jax.tree_util.tree_leaves(trainer.state.f_params)
    f_checksum = float(sum(np.float64(np.asarray(l).sum()) for l in f_leaves))

    with open(os.path.join(outdir, f"result_p{pid}.json"), "w") as f:
        json.dump({"pid": pid, "t_checksum": checksum,
                   "f_checksum": f_checksum,
                   "t_loss": metrics.get("t_loss"),
                   "ckpt_written": wrote}, f)
    print(f"worker {pid} OK", flush=True)


if __name__ == "__main__":
    main()
