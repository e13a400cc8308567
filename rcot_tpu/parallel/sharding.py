"""Device mesh + sharding for multi-chip training and inference.

The reference has no parallelism at all (SURVEY.md §2 census — one process,
one GPU via CUDA_VISIBLE_DEVICES). This module is the green-field TPU design:

- a `Mesh` over ICI with a 'data' axis (DP is the right strategy: the 47M-param
  model replicates trivially, batch shards);
- the train iteration jit-compiled with params/opt-state REPLICATED and batch
  inputs sharded on 'data' — XLA inserts the gradient all-reduce over ICI, we
  never hand-write a psum;
- optional 'spatial' axis for full-resolution inference: activations shard
  over image rows and XLA inserts halo exchanges for the 3x3 convs
  (the context-parallelism analog for this workload, SURVEY.md §5).

Multi-host entry: call jax.distributed.initialize() before building the mesh
(initialize_distributed below is a guarded wrapper).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def initialize_distributed(coordinator: Optional[str] = None,
                           num_processes: Optional[int] = None,
                           process_id: Optional[int] = None) -> None:
    """jax.distributed.initialize, no-op when single-process with no args.

    After init, runs one tiny cross-process psum to establish the collective
    context (Gloo on CPU) while process skew is still sub-second. The
    context's key-value rendezvous has a fixed ~30 s window, and the FIRST
    collective of a real run otherwise sits after minutes of compilation —
    two processes compiling at different speeds (shared machine, cold vs
    warm caches) routinely exceed it (observed: tests/test_multiprocess.py
    flaking under load with 'Gloo context initialization failed:
    DEADLINE_EXCEEDED'). Warming it here makes the window irrelevant."""
    if coordinator is None and num_processes in (None, 1):
        return
    jax.distributed.initialize(coordinator, num_processes, process_id)
    if jax.process_count() > 1:
        import jax.numpy as jnp
        mesh = Mesh(np.asarray(jax.devices()), ("warmup",))
        sharded = NamedSharding(mesh, P("warmup"))
        # put_global takes the PROCESS-LOCAL slice: one element per local
        # device (the global array has one element per global device)
        ones = put_global(np.ones((jax.local_device_count(),), np.float32),
                          sharded)
        # jnp.sum of a device-sharded array -> XLA all-reduce across processes
        out = jax.jit(jnp.sum, in_shardings=sharded,
                      out_shardings=NamedSharding(mesh, P()))(ones)
        jax.block_until_ready(out)


def make_mesh(data: Optional[int] = None, spatial: int = 1,
              devices: Optional[Sequence] = None) -> Mesh:
    """Build a ('data', 'spatial') mesh. Defaults: all devices on 'data'."""
    devs = list(devices if devices is not None else jax.devices())
    if data is None:
        data = len(devs) // spatial
    if data * spatial != len(devs):
        raise ValueError(f"mesh {data}x{spatial} != {len(devs)} devices")
    arr = np.asarray(devs).reshape(data, spatial)
    return Mesh(arr, ("data", "spatial"))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading batch dim over 'data'; everything else replicated."""
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def spatial_sharding(mesh: Mesh) -> NamedSharding:
    """(B, H, W, C) activations sharded over image rows for full-res inference;
    XLA inserts halo exchange for the 3x3 convs."""
    return NamedSharding(mesh, P(None, "spatial", None, None))


def _is_multi_process(mesh: Mesh) -> bool:
    return any(d.process_index != jax.process_index()
               for d in mesh.devices.flat)


def put_global(tree, sharding) -> object:
    """Host pytree -> global jax.Arrays under `sharding`.

    Single-process: a plain device_put. Multi-process (multi-controller JAX):
    every process passes its PROCESS-LOCAL data and the global array is
    assembled via jax.make_array_from_process_local_data — for a replicated
    spec each process passes the identical full array; for a batch-sharded
    spec each passes its per-host slice (so the global batch is
    per_host_batch * process_count).
    """
    multi = any(d.process_index != jax.process_index()
                for d in sharding.device_set)
    if multi:
        return jax.tree_util.tree_map(
            lambda x: jax.make_array_from_process_local_data(
                sharding, np.asarray(x)), tree)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sharding), tree)


def shard_batch(mesh: Mesh, batch):
    """Host batch pytree -> global arrays sharded over 'data'. Multi-process:
    each host contributes its local slice of the global batch."""
    return put_global(batch, batch_sharding(mesh))


def replicate(mesh: Mesh, tree):
    return put_global(tree, replicated(mesh))
