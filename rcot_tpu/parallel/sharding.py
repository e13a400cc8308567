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
  (the context-parallelism analog for this workload, SURVEY.md §5);
- optional 'tensor' axis: Megatron-style channel sharding of the transformer
  blocks (tensor_shardings below) for models that outgrow one chip's HBM.

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
                          sharded, local_slices=True)
        # jnp.sum of a device-sharded array -> XLA all-reduce across processes
        out = jax.jit(jnp.sum, in_shardings=sharded,
                      out_shardings=NamedSharding(mesh, P()))(ones)
        jax.block_until_ready(out)


def make_mesh(data: Optional[int] = None, spatial: int = 1, tensor: int = 1,
              devices: Optional[Sequence] = None) -> Mesh:
    """Build a ('data', 'spatial', 'tensor') mesh. Defaults: all devices on
    'data'. 'spatial' shards image rows (inference), 'tensor' shards channel
    dimensions of the transformer-block weights (tensor_shardings below)."""
    devs = list(devices if devices is not None else jax.devices())
    if data is None:
        data = len(devs) // (spatial * tensor)
    if data * spatial * tensor != len(devs):
        raise ValueError(
            f"mesh {data}x{spatial}x{tensor} != {len(devs)} devices")
    arr = np.asarray(devs).reshape(data, spatial, tensor)
    return Mesh(arr, ("data", "spatial", "tensor"))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading batch dim over 'data'; everything else replicated."""
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def spatial_sharding(mesh: Mesh) -> NamedSharding:
    """(B, H, W, C) activations sharded over image rows for full-res inference;
    XLA inserts halo exchange for the 3x3 convs."""
    return NamedSharding(mesh, P(None, "spatial", None, None))


def _is_multi_process(devices) -> bool:
    """True when any device in the iterable lives on another process."""
    return any(d.process_index != jax.process_index() for d in devices)


# -------------------------------------------------- tensor (channel) sharding

# Channel sharding inside each transformer block (SURVEY.md §5 names
# channel-sharded MDTA the stretch parallelism dimension): the qkv / GDFN-in
# 1x1 convs shard their OUTPUT channels ("column"), the depthwise 3x3 convs
# shard their (last-dim) channels to match, and the closing projections shard
# their INPUT channels ("row") so each device contributes a partial sum that
# XLA reduces over 'tensor'. Everything else — embeddings, up/down samplers,
# LayerNorms (which need the full channel axis), the critic — replicates.
# The map is (parent dict key) -> sharded dim of the "w" leaf.
#
# Scope note (honesty about what this buys): weights and optimizer moments
# genuinely shard — the memory-capacity win, the motivation stated in the
# module docstring, is real. But because qkv packs [q|k|v] along one output
# dim and GDFN's proj_in packs [x1|x2], a contiguous GSPMD shard of those
# dims crosses the logical q/k/v (head-split) and gelu(x1)*x2 boundaries, so
# XLA re-shards activations there rather than keeping the classic Megatron
# column->row device-local chain. Numerics are exact (tested ==replicated);
# per-block collectives are heavier than true Megatron TP would pay. Keeping
# the packed layouts (which the Pallas fused kernels and the reference
# checkpoint port both rely on) was chosen over head-aligned per-segment
# params. The bill is now PINNED from the compiled HLO (parallel/audit.py,
# perf/collective_audit.json, BENCH.md round 3): dp4 x tp2 moves 8.41 GB of
# collectives per train iteration vs dp8's 0.46 GB grad sync (~18x) —
# so 'tensor' is a memory-capacity axis only; use 'data' for throughput.
_COL = {"qkv": 3, "qkv_dw": 3, "proj_in": 3, "dw": 3}
_ROW = {"proj": 2, "proj_out": 2}


def _tensor_spec(path, leaf, n: int) -> P:
    names = [getattr(k, "key", None) for k in path]
    if not names or names[-1] not in ("w", "b"):
        return P()
    parent = names[-2] if len(names) >= 2 else None
    dim = None
    if parent in _COL:
        # bias follows the sharded output channels; weight shards its last dim
        dim = _COL[parent] if names[-1] == "w" else 0
    elif parent in _ROW and names[-1] == "w":
        dim = _ROW[parent]  # row-parallel: partial sums reduced over 'tensor'
    if dim is None or leaf.ndim <= dim or leaf.shape[dim] % n != 0:
        return P()  # non-divisible (e.g. GDFN hidden 127) -> replicate
    spec = [None] * leaf.ndim
    spec[dim] = "tensor"
    return P(*spec)


def tensor_shardings(mesh: Mesh, tree):
    """NamedSharding tree for params / optimizer moments: transformer-block
    channel dims shard over 'tensor', everything else replicates. Works on any
    pytree whose conv dicts use the model's key names (the optimizer moment
    trees mirror the param tree, so the same rule shards them identically)."""
    n = mesh.shape.get("tensor", 1)
    if n <= 1:
        return jax.tree_util.tree_map(lambda _: replicated(mesh), tree)
    return jax.tree_util.tree_map_with_path(
        lambda path, leaf: NamedSharding(mesh, _tensor_spec(path, leaf, n)),
        tree)


def shard_state(mesh: Mesh, tree):
    """Place a train state (or param tree) on the mesh: replicated on a pure
    data/spatial mesh, channel-sharded over 'tensor' when that axis is >1."""
    return put_global(tree, tensor_shardings(mesh, tree))


def put_global(tree, sharding, *, local_slices: bool = False) -> object:
    """Host pytree -> global jax.Arrays under `sharding` (one NamedSharding
    for every leaf, or a matching pytree of per-leaf shardings).

    Single-process: a plain device_put. Multi-process (multi-controller JAX),
    two distinct host-data semantics:

    - default (`local_slices=False`): every process holds the FULL GLOBAL
      array (params/opt state are initialized identically on every host);
      each leaf is assembled via jax.make_array_from_callback, which hands
      each process the global index of each of its addressable shards — so
      any sharding is correct, including channel dims sharded over a
      'tensor' axis that spans processes. (make_array_from_process_local_data
      would be WRONG here: it scales the global shape up by the number of
      processes along process-spanning sharded dims.)
    - `local_slices=True`: every process holds only its PER-HOST SLICE
      (data batches from the per-host-sharded loader); the global array is
      assembled via jax.make_array_from_process_local_data, so the global
      batch is per_host_batch * process_count.
    """
    if isinstance(sharding, NamedSharding):
        shardings = jax.tree_util.tree_map(lambda _: sharding, tree)
    else:
        shardings = sharding
    probe = jax.tree_util.tree_leaves(shardings)[0]
    multi = _is_multi_process(probe.device_set)
    if multi:
        if local_slices:
            return jax.tree_util.tree_map(
                lambda x, s: jax.make_array_from_process_local_data(
                    s, np.asarray(x)), tree, shardings)

        def _from_global(x, s):
            x = np.asarray(x)
            return jax.make_array_from_callback(x.shape, s,
                                                lambda idx: x[idx])

        return jax.tree_util.tree_map(_from_global, tree, shardings)
    return jax.tree_util.tree_map(jax.device_put, tree, shardings)


def shard_batch(mesh: Mesh, batch):
    """Host batch pytree -> global arrays sharded over 'data'. Multi-process:
    each host contributes its local slice of the global batch."""
    return put_global(batch, batch_sharding(mesh), local_slices=True)


def replicate(mesh: Mesh, tree):
    return put_global(tree, replicated(mesh))
