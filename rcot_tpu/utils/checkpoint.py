"""Pytree checkpoint store: atomic, resumable, keep-last-N.

Replaces the reference's whole-module pickles ({"epoch", "Tnet": module,
"Fnet": module}, reference: trainer.py:362-371) with pure arrays-and-metadata
checkpoints: the flattened TrainState (both param trees, both optimizer
states, step), the data-iterator position, the PRNG key, and the config
hash — everything needed for step-exact resume (SURVEY.md §5 checkpoint/
resume); the epoch rides the JSON metadata blob. Loading is template-driven
(extra npz keys are ignored), so checkpoints written when TrainState still
carried an in-state epoch leaf load unchanged.

Format: a single .npz of flattened key-paths -> arrays plus a JSON metadata
blob. Writes are atomic (tmp file + os.replace); a `latest` symlink tracks the
newest checkpoint; older ones beyond keep_n are pruned. Multi-host: only
process 0 writes (callers gate, helpers here are host-local).
"""

from __future__ import annotations

import json
import os
import tempfile
import threading
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

_META_KEY = "__rcot_meta__"
_SEP = "/"


def _flatten(tree: Any) -> Dict[str, np.ndarray]:
    flat = {}
    for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
        name = _SEP.join(_path_str(p) for p in path)
        flat[name] = np.asarray(leaf)
    return flat


def _path_str(entry) -> str:
    if hasattr(entry, "key"):
        return str(entry.key)
    if hasattr(entry, "idx"):
        return str(entry.idx)
    if hasattr(entry, "name"):
        return str(entry.name)
    return str(entry)


def save_checkpoint(path: str, state: Any, *, metadata: Optional[Dict] = None,
                    keep_n: int = 0) -> str:
    """Atomically write `state` (any pytree) to `path` (.npz appended if absent).

    With keep_n > 0, prunes older checkpoints matching the same prefix pattern
    `<dir>/<base>_step*.npz` and refreshes `<dir>/latest.npz` (a copy-free
    symlink).
    """
    if not path.endswith(".npz"):
        path = path + ".npz"
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    flat = _flatten(state)
    meta = dict(metadata or {})
    meta["treedef"] = None  # structure is rebuilt against a template on load
    payload = {k: v for k, v in flat.items()}
    payload[_META_KEY] = np.frombuffer(
        json.dumps(meta, default=str).encode(), dtype=np.uint8)

    fd, tmp = tempfile.mkstemp(dir=os.path.dirname(path) or ".", suffix=".tmp")
    try:
        with os.fdopen(fd, "wb") as f:
            np.savez(f, **payload)
            # fsync BEFORE the rename: os.replace alone makes the NAME
            # durable but not the data pages — a crash could leave
            # latest.npz pointing at a truncated file after keep-N pruning
            # already deleted the older good checkpoints
            f.flush()
            os.fsync(f.fileno())
        os.replace(tmp, path)
    finally:
        if os.path.exists(tmp):
            os.unlink(tmp)

    d = os.path.dirname(path) or "."
    latest = os.path.join(d, "latest.npz")
    try:
        if os.path.islink(latest) or os.path.exists(latest):
            os.unlink(latest)
        os.symlink(os.path.basename(path), latest)
    except OSError:
        pass

    if keep_n > 0:
        base = os.path.basename(path).rsplit("_step", 1)[0]

        def step_of(fname: str) -> int:
            # numeric sort: lexicographic ordering deletes the NEWEST
            # checkpoints once the step count crosses a digit boundary
            # ("step112" < "step80" as strings) and leaves latest.npz
            # dangling — observed on a real 15-epoch run
            tail = fname[len(base + "_step"):-len(".npz")]
            try:
                return int(tail)
            except ValueError:
                return -1
        siblings = sorted(
            (f for f in os.listdir(d)
             if f.startswith(base + "_step") and f.endswith(".npz")),
            key=step_of)
        for old in siblings[:-keep_n]:
            # never prune the file just written (latest.npz points at it) —
            # stale HIGHER-step files from a previous run in the same dir
            # would otherwise sort it into the delete set
            if old != os.path.basename(path):
                os.unlink(os.path.join(d, old))
    return path


# One jitted whole-tree copy: a donation-safe snapshot of the state. The
# train step donates the live state buffers (donate_argnums), so a
# background writer must not hold references to them — by the time it
# fetches, the next dispatched step has already reused the memory. The
# on-device copy is cheap (HBM-to-HBM, well under a millisecond for the
# whole 77M-param state at v5e bandwidth) and is ordered by the runtime
# BEFORE any later computation that consumes the donated original. ONE
# jit program (vs per-leaf jnp.copy) matters doubly: a remote-attached
# TPU pays a tunnel round-trip per dispatch (hundreds of leaves), and on
# CPU backends the per-leaf path measured 4.2 s vs 3.6 s for the sync
# save it was meant to hide. jit caches by tree structure/shapes, so the
# copy program compiles once per run; input shardings are preserved.
snapshot_state = jax.jit(
    lambda state: jax.tree_util.tree_map(jnp.copy, state))


def _ensure_snapshot(state, snapshotted):
    return state if snapshotted else snapshot_state(state)


class AsyncCheckpointer:
    """Background-thread checkpoint writer (the orbax-style async save).

    The synchronous save path costs the training loop a device->host
    transfer of the full state plus a zipped npz write + fsync — measured
    as a large slice of the 0.34 s/step epoch wall vs the 0.129 s/step
    device rate on the round-3 capstone (1-core host, remote-attached TPU).
    save() dispatches an on-device snapshot copy (donation-safe, see
    _device_snapshot) and returns immediately; the D2H transfer and the
    atomic write run on a worker thread, overlapped with subsequent train
    steps (JAX transfers and file IO release the GIL).

    At most one save is in flight: a second save() first joins the pending
    one (backpressure), which serializes keep-N pruning and the `latest`
    symlink update — OR, with skip_if_busy=True, returns None without
    writing when a save is still in flight. Periodic checkpoints should
    skip, not block: the r5 capstone measured 50-90 s stalls at EVERY
    300-step checkpoint because the 620 MB tunnel write outlives the
    inter-checkpoint compute window, so backpressure turned the async path
    back into a synchronous one (runs/all_in_one_r5.jsonl epochs 1-2: every
    >5 s/step window sits exactly on the ckpt cadence). Skipping one
    periodic save costs nothing — the in-flight one already bounds lost
    work. A worker-thread failure re-raises at the next save()/wait()
    rather than being lost. Callers on a shutdown path (preemption, end of
    fit) must wait() so the final checkpoint is durable before the process
    exits.
    """

    def __init__(self):
        self._thread: Optional[threading.Thread] = None
        self._err: Optional[BaseException] = None

    @property
    def busy(self) -> bool:
        return self._thread is not None and self._thread.is_alive()

    def save(self, path: str, state: Any, *,
             metadata: Optional[Dict] = None, keep_n: int = 0,
             snapshotted: bool = False,
             skip_if_busy: bool = False) -> Optional[str]:
        """snapshotted=True: `state` is already a donation-safe snapshot
        (multi-host callers take it SPMD-symmetrically on every process via
        snapshot_state() BEFORE the lead-only gate — launching the jitted
        copy from a single controller over global arrays is undefined).
        skip_if_busy=True: return None instead of blocking when a previous
        write is still in flight (periodic-save semantics)."""
        if skip_if_busy and self.busy:
            return None
        self.wait()
        snap = _ensure_snapshot(state, snapshotted)

        def work():
            try:
                save_checkpoint(path, snap, metadata=metadata, keep_n=keep_n)
            except BaseException as e:  # surfaced on the training thread
                self._err = e

        self._thread = threading.Thread(
            target=work, name="rcot-async-ckpt", daemon=True)
        self._thread.start()
        return path if path.endswith(".npz") else path + ".npz"

    def wait(self) -> None:
        """Join the in-flight write (if any); re-raise its failure."""
        if self._thread is not None:
            self._thread.join()
            self._thread = None
        if self._err is not None:
            err, self._err = self._err, None
            raise err


def read_metadata(path: str) -> Dict:
    """Read just the JSON metadata blob (config, epoch, ...) from a checkpoint."""
    if os.path.islink(path):
        path = os.path.join(os.path.dirname(path), os.readlink(path))
    with np.load(path) as z:
        if _META_KEY not in z:
            return {}
        return json.loads(bytes(z[_META_KEY].tobytes()).decode())


def load_checkpoint(path: str, template: Any) -> Tuple[Any, Dict]:
    """Load into the structure of `template` (a pytree with matching leaves).

    Template leaves only need .shape/.dtype — real arrays or
    jax.ShapeDtypeStruct (use jax.eval_shape to build a template without
    materializing 77M params). Returns (state, metadata); a shape mismatch
    raises with the offending key path.
    """
    if os.path.islink(path):
        path = os.path.join(os.path.dirname(path), os.readlink(path))
    with np.load(path) as z:
        meta = json.loads(bytes(z[_META_KEY].tobytes()).decode()) if _META_KEY in z else {}
        flat, _ = jax.tree_util.tree_flatten_with_path(template)
        leaves = []
        for kpath, want in flat:
            name = _SEP.join(_path_str(p) for p in kpath)
            if name not in z:
                raise KeyError(f"checkpoint missing leaf {name!r}")
            arr = z[name]
            if tuple(arr.shape) != tuple(want.shape):
                raise ValueError(
                    f"shape mismatch at {name!r}: ckpt {arr.shape} vs template {want.shape}")
            leaves.append(arr.astype(want.dtype))
    treedef = jax.tree_util.tree_structure(template)
    state = jax.tree_util.tree_unflatten(treedef, leaves)
    return state, meta
