"""Input pipeline: threaded host decode + device-side preproc, double-buffered.

The reference blocks the GPU on Python DataLoader workers doing PIL decode,
numpy augment and noise per sample (reference: trainer.py:134-135,247). Here:

- a thread pool decodes/crops uint8 patches (PIL releases the GIL in decode);
- batches are device_put ahead of consumption (`prefetch` deep) so H2D overlaps
  compute;
- augmentation + degradation synthesis run on-device (data/degradations.py),
  jit-fused, keyed by a counter-derived PRNG key -> the whole pipeline is
  deterministic given (seed, epoch, step) and resumable mid-epoch.

Per-host sharding: each process takes a strided slice of the shuffled index
(process_index::process_count), the standard JAX host-batch split.
"""

from __future__ import annotations

import collections
import random
from concurrent.futures import ThreadPoolExecutor
from typing import Iterator, Optional

import jax
import numpy as np

from ..utils.config import Config
from .datasets import TrainIndex, _check_patchable, get_patch_pair


class HostBatch:
    __slots__ = ("degraded", "clean", "de_id")

    def __init__(self, degraded: np.ndarray, clean: np.ndarray, de_id: np.ndarray):
        self.degraded = degraded
        self.clean = clean
        self.de_id = de_id


class TrainLoader:
    """Deterministic, resumable epoch iterator over host batches.

    When the native C++ loader is built (native/build.sh), image decode +
    patch crop run on its thread pool in ONE call per batch (use_native=None
    auto-detects); the PIL path is the fallback and produces IDENTICAL
    batches (same RNG draw order)."""

    def __init__(self, cfg: Config, *, seed: int = 0,
                 process_index: Optional[int] = None,
                 process_count: Optional[int] = None,
                 use_native: Optional[bool] = None):
        from . import native as native_mod
        self.cfg = cfg
        self.seed = seed
        self.pi = jax.process_index() if process_index is None else process_index
        self.pc = jax.process_count() if process_count is None else process_count
        self.index = TrainIndex(cfg.data, random.Random(seed))
        self.pool = ThreadPoolExecutor(max_workers=max(1, cfg.data.num_workers))
        self.native = native_mod if (
            use_native if use_native is not None else native_mod.available()) else None
        self._dims_cache = {}

    def _dims(self, path: str):
        hw = self._dims_cache.get(path)
        if hw is None:
            hw = self.native.image_size(path)
            self._dims_cache[path] = hw
        return hw

    def steps_per_epoch(self) -> int:
        local = len(range(self.pi, len(self.index), self.pc))
        return local // self.cfg.train.batch_size

    def epoch(self, epoch: int, start_step: int = 0) -> Iterator[HostBatch]:
        """Yield batches for `epoch`, skipping the first `start_step` (resume)."""
        order = list(range(len(self.index)))
        random.Random(f"{self.seed}:{epoch}").shuffle(order)
        order = order[self.pi::self.pc]
        bs = self.cfg.train.batch_size
        n_batches = len(order) // bs

        def make_pil(bstep: int) -> HostBatch:
            rng = random.Random(f"{self.seed}:{epoch}:{bstep}:{self.pi}")
            samples = [self.index.samples[order[bstep * bs + k]] for k in range(bs)]
            degs, cleans, ids = [], [], []
            for s in samples:
                d, c, i = get_patch_pair(
                    s, self.cfg.data.patch_size, self.cfg.data.crop_base, rng)
                degs.append(d)
                cleans.append(c)
                ids.append(i)
            return HostBatch(np.stack(degs), np.stack(cleans),
                             np.asarray(ids, np.int32))

        def make_native(bstep: int) -> HostBatch:
            # identical RNG draw order to make_pil -> identical batches
            rng = random.Random(f"{self.seed}:{epoch}:{bstep}:{self.pi}")
            samples = [self.index.samples[order[bstep * bs + k]] for k in range(bs)]
            ps = self.cfg.data.patch_size
            base = self.cfg.data.crop_base
            paths, ys, xs, slots, ids = [], [], [], [], []
            for k, s in enumerate(samples):
                ids.append(s.de_id)
                # crop-to-base offsets match datasets.crop_to_base; the
                # random (i, j) draw comes from the DEGRADED image's cropped
                # geometry (one draw — the same RNG consumption as make_pil)
                lead = s.degraded_path if s.de_id >= 3 else s.clean_path
                h, w = self._dims(lead)
                top, left = (h % base) // 2, (w % base) // 2
                hh, ww = h - h % base, w - w % base
                _check_patchable(lead, hh, ww, ps, base)
                i = rng.randint(0, hh - ps)
                j = rng.randint(0, ww - ps)
                if s.de_id < 3:
                    paths.append(s.clean_path)
                    ys.append(top + i)
                    xs.append(left + j)
                    slots.append(("both", k))
                else:
                    # the clean image's base offsets come from ITS OWN
                    # dimensions (get_patch_pair crops each image with its
                    # own crop_to_base, then indexes both with the shared
                    # i,j) — using the degraded offsets here diverged from
                    # the PIL path whenever a pair's sizes differ
                    ch, cw = self._dims(s.clean_path)
                    _check_patchable(s.clean_path, ch - ch % base,
                                     cw - cw % base, ps, base)
                    ctop, cleft = (ch % base) // 2, (cw % base) // 2
                    paths.extend([s.degraded_path, s.clean_path])
                    ys.extend([top + i, ctop + i])
                    xs.extend([left + j, cleft + j])
                    slots.extend([("deg", k), ("clean", k)])
            patches = self.native.load_patches(
                paths, ys, xs, ps, nthreads=max(1, self.cfg.data.num_workers))
            degs = np.empty((bs, ps, ps, 3), np.uint8)
            cleans = np.empty((bs, ps, ps, 3), np.uint8)
            for patch, (kind, k) in zip(patches, slots):
                if kind in ("both", "deg"):
                    degs[k] = patch
                if kind in ("both", "clean"):
                    cleans[k] = patch
            return HostBatch(degs, cleans, np.asarray(ids, np.int32))

        make = make_native if self.native is not None else make_pil

        window = max(2, self.cfg.data.prefetch + 1)
        pending = collections.deque()
        nxt = start_step
        while nxt < n_batches and len(pending) < window:
            pending.append(self.pool.submit(make, nxt))
            nxt += 1
        while pending:
            yield pending.popleft().result()
            if nxt < n_batches:
                pending.append(self.pool.submit(make, nxt))
                nxt += 1


def device_prefetch(host_iter, size: int = 2, sharding=None):
    """Move host batches to device `size` ahead of consumption.

    With a sharding that spans processes (multi-host DP), each host's batch is
    its local slice of the global batch (global = per_host_batch *
    process_count) and the global array is assembled without gathering."""
    queue = collections.deque()

    def put(b):
        if sharding is not None:
            from ..parallel.sharding import put_global
            return put_global((b.degraded, b.clean, b.de_id), sharding,
                              local_slices=True)
        return jax.tree_util.tree_map(jax.device_put, (b.degraded, b.clean, b.de_id))

    it = iter(host_iter)
    if size <= 0:  # prefetch disabled: plain pass-through, never zero batches
        for b in it:
            yield put(b)
        return
    try:
        for _ in range(size):
            queue.append(put(next(it)))
    except StopIteration:
        pass
    while queue:
        out = queue.popleft()
        try:
            queue.append(put(next(it)))
        except StopIteration:
            pass
        yield out
