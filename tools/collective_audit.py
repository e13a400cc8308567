"""Audit the collectives GSPMD inserts for each parallelism config.

No multi-chip hardware exists in this sandbox, so the 'tensor' / 'spatial'
axes' collective COST cannot be timed (VERDICT r2 "What's weak" #4). What
CAN be pinned is the collective SCHEDULE: compile the real train iteration /
inference forward over an 8-virtual-device CPU mesh (the same fake-backend
trick the test suite uses) and parse the partitioned HLO for every
all-reduce / all-gather / reduce-scatter / collective-permute / all-to-all —
kind, count, payload bytes, and which mesh axis it rides (classified by
replica-group size). The dp-only schedule is the baseline; the dp x tensor
delta IS Megatron-style TP's per-iteration communication bill, in bytes,
which an ICI bandwidth turns into time analytically.

Writes perf/collective_audit.json and prints a summary table.
Run: XLA_FLAGS=--xla_force_host_platform_device_count=8 python tools/collective_audit.py
(the script forces the CPU backend itself; tests/test_parallel.py asserts
the structural invariants so regressions surface in the fast lane).
"""

import json
import os
import sys

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402

from rcot_tpu.parallel.audit import audit_hlo  # noqa: E402

OUT = os.path.join(os.path.dirname(__file__), "..", "perf",
                   "collective_audit.json")


def _train_iteration_hlo(mesh, cfg, tensor=False):
    from rcot_tpu.parallel.sharding import (replicate, shard_batch,
                                            shard_state)
    from rcot_tpu.train.steps import Batch, create_train_state, make_train_iteration

    state = create_train_state(jax.random.PRNGKey(0), cfg)
    state = shard_state(mesh, state) if tensor else replicate(mesh, state)
    bs, ps = cfg.train.batch_size, cfg.data.patch_size
    rng = np.random.default_rng(0)
    batch = shard_batch(mesh, Batch(
        degraded=rng.uniform(size=(bs, ps, ps, 3)).astype(np.float32),
        target=rng.uniform(size=(bs, ps, ps, 3)).astype(np.float32),
        de_id=np.tile(np.array([0, 3], np.int32), bs)[:bs]))
    lowered = jax.jit(make_train_iteration(cfg)).lower(
        state, batch, jax.random.PRNGKey(1), jax.numpy.array(True),
        jax.numpy.float32(1e-4))
    return lowered.compile().as_text()


def main(full: bool) -> dict:
    from rcot_tpu.parallel.sharding import make_mesh
    from rcot_tpu.utils.config import (Config, CriticConfig, DataConfig,
                                       ModelConfig, TrainConfig)

    n = 8
    if len(jax.devices()) < n:
        raise SystemExit(
            "need XLA_FLAGS=--xla_force_host_platform_device_count=8")

    if full:
        # the real parity model at the canonical patch: true byte volumes
        cfg = Config(train=TrainConfig(batch_size=8, dtype="bfloat16"))
    else:
        cfg = Config(
            model=ModelConfig(dim=8, num_blocks=(1, 1, 1, 1),
                              num_refinement_blocks=1, parity_params=False),
            critic=CriticConfig(patch_size=32),
            data=DataConfig(patch_size=32),
            train=TrainConfig(batch_size=8))

    os.environ["RCOT_PALLAS"] = "0"  # CPU lowering: no Pallas TPU kernels

    report = {"devices": n, "model": "parity" if full else "tiny",
              "patch": cfg.data.patch_size, "batch": cfg.train.batch_size,
              "configs": {}}

    mesh_dp = make_mesh(data=n, devices=jax.devices()[:n])
    hlo = _train_iteration_hlo(mesh_dp, cfg)
    report["configs"]["dp8"] = audit_hlo(hlo, {n: "data"}, {1: "data"}, n_devices=n)

    mesh_tp = make_mesh(data=n // 2, tensor=2, devices=jax.devices()[:n])
    hlo = _train_iteration_hlo(mesh_tp, cfg, tensor=True)
    report["configs"]["dp4xtp2"] = audit_hlo(
        hlo, {2: "tensor", n // 2: "data", n: "data*tensor"},
        {1: "tensor", 2: "data"}, n_devices=n)

    # Spatial sharding (context-parallelism analog): the inference forward
    # over image rows on a (data x spatial) mesh — GSPMD's halo exchanges
    # for the 3x3 convs ride the spatial axis as collective-permutes.
    from rcot_tpu.models.restormer import apply_tnet, init_tnet
    from rcot_tpu.parallel.sharding import replicate

    from jax.sharding import NamedSharding, PartitionSpec as P

    mesh_sp = make_mesh(data=n // 2, spatial=2, devices=jax.devices()[:n])
    ps = cfg.data.patch_size * 2
    p_sp = replicate(mesh_sp, init_tnet(jax.random.PRNGKey(0), cfg.model))
    x_sp = jax.device_put(
        jax.numpy.zeros((n // 2, ps, ps, 3)),
        NamedSharding(mesh_sp, P("data", "spatial")))
    hlo = jax.jit(
        lambda p, x: apply_tnet(p, x, cfg.model)[0]).lower(
            p_sp, x_sp).compile().as_text()
    report["configs"]["dp4xsp2_infer"] = audit_hlo(
        hlo, {2: "spatial", n // 2: "data", n: "data*spatial"},
        {1: "spatial", 2: "data"}, n_devices=n)

    dp = report["configs"]["dp8"]["total"]
    tp = report["configs"]["dp4xtp2"]["total"]
    report["tp_delta"] = {
        "extra_collectives": tp["count"] - dp["count"],
        "extra_bytes": tp["bytes"] - dp["bytes"],
        "note": ("dp->dp x tp delta = Megatron-style TP's per-iteration "
                 "communication bill; bytes / ICI-bw = analytic time cost"),
    }
    return report


if __name__ == "__main__":
    full = "--full" in sys.argv
    rep = main(full)
    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    mode = "full" if full else "tiny"
    try:
        with open(OUT) as f:
            existing = json.load(f)
    except (OSError, ValueError):
        existing = {}
    existing[mode] = rep
    with open(OUT, "w") as f:
        json.dump(existing, f, indent=1)
    for name, c in rep["configs"].items():
        print(name, json.dumps(c["total"]), {
            k: v["count"] for k, v in c["per_kind"].items()})
    print("tp_delta", json.dumps(rep["tp_delta"]))
    print("wrote", os.path.normpath(OUT))
