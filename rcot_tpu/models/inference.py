"""Full-resolution inference: pad-to-mod-8, shape bucketing, overlap tiling,
batched folder restoration, and mesh-sharded full-res execution.

The reference crops test images to mod-4 and feeds variable full-res shapes
one at a time (reference: tester.py:77-107) — which both violates the
network's mod-8 contract (SURVEY.md §2.2 #9) and would recompile XLA per
shape. This module fixes both:

- pad_to_multiple: reflect-pad up to the contract, crop back after (lossless,
  unlike the reference's cropping which discards pixels);
- bucketed whole-image inference: pad H,W up to the next bucket so a folder
  of arbitrary sizes compiles only a handful of programs;
- restore_batch: many same-bucket images in ONE forward (the reference's loop
  is strictly batch-1, tester.py:63-107 — batching keeps the MXU full);
- overlap-tiled inference with feathered blending for images too large
  for HBM — the working version of the reference's dead tile_degrad
  (util/dataset_utils.py:323-347) and slice/splice utilities
  (util/image_utils.py:68-98), batched so tiles fill the MXU;
- spatial sharding: pass a Mesh and activations shard over image rows across
  chips (XLA inserts halo exchanges for the 3x3 convs) so full-res images
  exceeding one chip's HBM still run whole (parallel/sharding.py).

Params are a call argument of the jitted function (not a closure), so a
Restorer survives parameter updates — the per-epoch validation loop reuses
one compiled program for a whole training run.
"""

from __future__ import annotations

from typing import Callable, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def _reflect_pad_hw(x: jax.Array, ph: int, pw: int) -> jax.Array:
    """Reflect-pad the bottom/right of (B,H,W,C) by (ph, pw), chunked so pads
    larger than the image (small image, big bucket) stay legal for reflect.
    A size-1 dimension cannot reflect (no progress possible) — the remainder
    edge-replicates instead of looping forever."""
    while ph or pw:
        h, w = x.shape[1:3]
        dh, dw = min(ph, h - 1), min(pw, w - 1)
        if (ph and not dh) or (pw and not dw):  # that axis is size 1: stuck
            eh, ew = (ph if not dh else 0), (pw if not dw else 0)
            x = jnp.pad(x, ((0, 0), (0, eh), (0, ew), (0, 0)), mode="edge")
            ph -= eh
            pw -= ew
            continue
        x = jnp.pad(x, ((0, 0), (0, dh), (0, dw), (0, 0)), mode="reflect")
        ph -= dh
        pw -= dw
    return x


def pad_to_multiple(x: jax.Array, base: int = 8) -> Tuple[jax.Array, Tuple[int, int]]:
    """Reflect-pad (B, H, W, C) so H, W % base == 0. Returns (padded, (H, W))."""
    _, h, w, _ = x.shape
    ph = (-h) % base
    pw = (-w) % base
    if ph or pw:
        x = _reflect_pad_hw(x, ph, pw)
    return x, (h, w)


def crop_back(y: jax.Array, hw: Tuple[int, int]) -> jax.Array:
    h, w = hw
    return y[:, :h, :w, :]


def bucket_size(n: int, base: int = 8, buckets: Tuple[int, ...] = ()) -> int:
    """Round n up to the next bucket (or next multiple of base past the last)."""
    for b in buckets:
        if n <= b:
            return b
    return ((n + base - 1) // base) * base


class Restorer:
    """Jit-cached whole-image / tiled / batched restoration around a model fn.

    model_fn: (params, x: (B,H,W,C)) -> (B,H,W,C), H,W % 8 == 0 — params is a
    traced argument, so `update_params` swaps weights without recompiling.
    (A param-less fn(x) also works: pass params=None.) Shapes are bucketed so
    repeated calls over a test folder reuse compiled programs.

    mesh: optional jax.sharding.Mesh with a 'spatial' axis — full-res
    activations shard over image rows (H padded to a multiple of the axis
    size), params replicate, and XLA inserts the halo exchanges.
    """

    def __init__(self, model_fn: Callable, *, params=None,
                 pad_base: int = 8,
                 buckets: Tuple[int, ...] = (128, 256, 384, 512, 768, 1024),
                 tile: int = 0, tile_overlap: int = 32, mesh=None,
                 out_scale: int = 1):
        self.pad_base = pad_base
        self.buckets = buckets
        self.tile = tile
        self.tile_overlap = tile_overlap
        # model_fn maps (B,H,W,C) -> (B,H*out_scale,W*out_scale,C) (legacy SR
        # mode upsamples inside the forward, Net.py:182-183); crops scale too
        self.out_scale = out_scale
        if out_scale != 1 and tile:
            raise ValueError("tiled inference does not support out_scale != 1 "
                             "(whole-image SR inputs are small by nature)")
        self.params = params
        self._takes_params = params is not None
        self._mesh = mesh
        if mesh is not None:
            from ..parallel.sharding import replicated, spatial_sharding
            self._spatial = spatial_sharding(mesh)
            n_rows = mesh.shape["spatial"]
            self.pad_base = pad_base * n_rows  # every shard row mod-8
            if self._takes_params:
                self.params = jax.device_put(params, replicated(mesh))
                self._jitted = jax.jit(
                    model_fn, in_shardings=(replicated(mesh), self._spatial),
                    out_shardings=self._spatial)
            else:
                self._jitted = jax.jit(model_fn, in_shardings=self._spatial,
                                       out_shardings=self._spatial)
        else:
            self._jitted = jax.jit(model_fn)

    def update_params(self, params) -> None:
        """Swap model weights; compiled programs are reused (same shapes)."""
        if not self._takes_params:
            raise ValueError("this Restorer was built without params")
        if self._mesh is not None:
            from ..parallel.sharding import replicated
            params = jax.device_put(params, replicated(self._mesh))
        self.params = params

    def _fwd(self, x: jax.Array) -> jax.Array:
        if self._mesh is not None:
            x = jax.device_put(x, self._spatial)
        if self._takes_params:
            return self._jitted(self.params, x)
        return self._jitted(x)

    def __call__(self, img: np.ndarray) -> np.ndarray:
        """img: (H, W, C) float32 in [0,1] -> restored (H, W, C)."""
        x = jnp.asarray(img)[None]
        if self.tile and max(img.shape[:2]) > self.tile:
            out = self._tiled(x)
        else:
            out = self._whole(x)
        return np.asarray(out[0])

    def restore_batch(self, imgs: Sequence[np.ndarray]) -> List[np.ndarray]:
        """Restore several images in one forward per bucket group.

        Images are grouped by (bucketed H, bucketed W); each group pads to
        its bucket and runs as a single batch. Order is preserved. With a
        tile configured, images exceeding it route through the overlap-tiled
        path individually — batching whole an image that --tile was meant to
        make fit in HBM would silently drop the tiling and OOM.
        """
        groups: dict = {}
        out: List[Optional[np.ndarray]] = [None] * len(imgs)
        for i, im in enumerate(imgs):
            h, w = im.shape[:2]
            if self.tile and max(h, w) > self.tile:
                out[i] = self(im)
                continue
            key = (bucket_size(h, self.pad_base, self.buckets),
                   bucket_size(w, self.pad_base, self.buckets))
            groups.setdefault(key, []).append(i)
        for (bh, bw), idxs in groups.items():
            batch = jnp.concatenate([
                _reflect_pad_hw(jnp.asarray(imgs[i])[None],
                                bh - imgs[i].shape[0], bw - imgs[i].shape[1])
                for i in idxs])
            ys = self._fwd(batch)
            s = self.out_scale
            for k, i in enumerate(idxs):
                h, w = imgs[i].shape[:2]
                out[i] = np.asarray(ys[k, :h * s, :w * s, :])
        return out  # type: ignore[return-value]

    def _whole(self, x: jax.Array) -> jax.Array:
        _, h, w, _ = x.shape
        bh = bucket_size(h, self.pad_base, self.buckets)
        bw = bucket_size(w, self.pad_base, self.buckets)
        padded = _reflect_pad_hw(x, bh - h, bw - w) if (bh > h or bw > w) else x
        y = self._fwd(padded)
        s = self.out_scale
        return y[:, :h * s, :w * s, :]

    def _tiled(self, x: jax.Array) -> jax.Array:
        """Overlap-tiled restoration with FEATHERED blending; all tiles run
        as one batched forward so the MXU stays full.

        Feathering: each tile contributes with a separable tent profile that
        ramps linearly across the overlap band, so seams blend smoothly
        instead of averaging with a hard step (the working, improved version
        of the reference's dead tile_degrad, util/dataset_utils.py:323-347).
        Interior weights are constant, and profiles are renormalized by the
        accumulated weight, so fully-covered pixels are exact.
        """
        tile, ov = self.tile, self.tile_overlap
        _, h, w, c = x.shape
        t = min(tile, h, w)
        t -= t % self.pad_base
        if t < self.pad_base:
            # one dimension is thinner than a single pad unit — no tile grid
            # is possible; the whole path buckets/pads it instead
            return self._whole(x)
        # the overlap must leave a positive stride (a narrow dimension can
        # shrink t below the configured overlap, which would make the range
        # step zero/negative)
        ov = min(ov, t - self.pad_base)
        stride = t - ov
        hs = list(range(0, max(h - t, 0) + 1, stride))
        ws = list(range(0, max(w - t, 0) + 1, stride))
        if hs[-1] != h - t:
            hs.append(h - t)
        if ws[-1] != w - t:
            ws.append(w - t)

        tiles = jnp.stack([x[0, i:i + t, j:j + t, :] for i in hs for j in ws])
        # one transfer to host, then numpy-view accumulation: per-tile
        # .at[].add on device would dispatch two full-image XLA ops per tile
        # (each copying the whole (H,W,C) accumulator — O(n_tiles * H * W))
        outs = np.asarray(self._fwd(tiles), np.float32)

        # separable tent: ramp over the overlap width, flat in the interior
        ramp = np.ones(t, np.float32)
        if ov > 0:
            edge = np.linspace(1.0 / (ov + 1), 1.0, ov, dtype=np.float32)
            ramp[:ov] = edge
            ramp[-ov:] = edge[::-1]
        prof = np.outer(ramp, ramp)[:, :, None]

        acc = np.zeros((h, w, c), np.float32)
        weight = np.zeros((h, w, 1), np.float32)
        k = 0
        for i in hs:
            for j in ws:
                acc[i:i + t, j:j + t, :] += outs[k] * prof
                weight[i:i + t, j:j + t, :] += prof
                k += 1
        return jnp.asarray(acc / weight)[None]


def make_restorer(params, model_cfg, *, tile: int = 0, tile_overlap: int = 32,
                  dtype=jnp.float32, mesh=None, backbone: str = "restormer",
                  sr_scale: int = 0) -> Restorer:
    """backbone: 'restormer' (the flagship T_net) or 'mprnet' (the legacy
    paper-v1 backbone the distributed pretrained weights use,
    reference: README.md:118-120 / Net.py:179-216). sr_scale applies the
    legacy SR-mode bicubic pre-upsample (Net.py:182-183, mprnet only)."""
    from ..ops import dispatch

    if backbone == "restormer":
        if sr_scale:
            raise ValueError(
                "sr_scale is a legacy (mprnet) mode; the Restormer-era SR "
                "recipe feeds pre-upscaled bicubic inputs (README.md:17)")
        from .restormer import apply_tnet

        def fn(p, x):
            # the `with` runs at TRACE time (fn is traced under jit), so
            # block_mode() can resolve forward-only kernel compositions
            with dispatch.inference_scope():
                out2, _, _ = apply_tnet(p, x.astype(dtype), model_cfg)
            return out2.astype(jnp.float32)
    elif backbone == "mprnet":
        from .mprnet import apply_mprnet_tnet

        def fn(p, x):
            with dispatch.inference_scope():
                out2, _, _ = apply_mprnet_tnet(
                    p, x.astype(dtype), sr_scale=sr_scale,
                    residual_cond_scale=model_cfg.latent_cond_scale)
            return out2.astype(jnp.float32)
    else:
        raise ValueError(f"unknown backbone {backbone!r}")

    return Restorer(fn, params=params, tile=tile, tile_overlap=tile_overlap,
                    mesh=mesh, out_scale=sr_scale or 1)
