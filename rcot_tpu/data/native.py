"""ctypes bindings for the native C++ patch loader (native/patchloader.cc).

Gracefully degrades: if the shared library hasn't been built (native/build.sh)
the loader reports unavailable and callers fall back to PIL. The library does
libpng/libjpeg decode + patch crop on a C++ thread pool — no GIL, one call
per batch.
"""

from __future__ import annotations

import ctypes
import os
from typing import Sequence, Tuple

import numpy as np

_LIB_PATH = os.path.join(os.path.dirname(__file__), "..", "..", "native",
                         "librcot_patchloader.so")
_lib = None
_tried = False


def _load():
    global _lib, _tried
    if _tried:
        return _lib
    _tried = True
    try:
        lib = ctypes.CDLL(os.path.abspath(_LIB_PATH))
        lib.rcot_image_size.argtypes = [
            ctypes.c_char_p, ctypes.POINTER(ctypes.c_int),
            ctypes.POINTER(ctypes.c_int)]
        lib.rcot_image_size.restype = ctypes.c_int
        lib.rcot_decode_rgb.argtypes = [
            ctypes.c_char_p, ctypes.POINTER(ctypes.c_ubyte),
            ctypes.c_int, ctypes.c_int]
        lib.rcot_decode_rgb.restype = ctypes.c_int
        lib.rcot_load_patches.argtypes = [
            ctypes.POINTER(ctypes.c_char_p), ctypes.c_int,
            ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
            ctypes.c_int, ctypes.c_int, ctypes.POINTER(ctypes.c_ubyte)]
        lib.rcot_load_patches.restype = ctypes.c_int
        _lib = lib
    except OSError:
        _lib = None
    return _lib


def available() -> bool:
    return _load() is not None


def _require() -> ctypes.CDLL:
    lib = _load()
    if lib is None:
        raise RuntimeError(
            "native patch loader unavailable — build it with native/build.sh "
            "(callers should gate on native.available() and fall back to PIL)")
    return lib


def image_size(path: str) -> Tuple[int, int]:
    lib = _require()
    h = ctypes.c_int()
    w = ctypes.c_int()
    if lib.rcot_image_size(path.encode(), ctypes.byref(h), ctypes.byref(w)):
        raise IOError(f"native decode failed for {path}")
    return h.value, w.value


def decode_rgb(path: str) -> np.ndarray:
    lib = _require()
    h, w = image_size(path)
    out = np.empty((h, w, 3), np.uint8)
    rc = lib.rcot_decode_rgb(
        path.encode(), out.ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte)), h, w)
    if rc:
        raise IOError(f"native decode failed for {path} (rc={rc})")
    return out


def load_patches(paths: Sequence[str], ys: Sequence[int], xs: Sequence[int],
                 patch_size: int, *, nthreads: int = 8) -> np.ndarray:
    """Decode len(paths) images and crop (patch_size)^2 RGB patches at
    (ys[i], xs[i]); returns (N, ps, ps, 3) uint8."""
    lib = _require()
    n = len(paths)
    out = np.empty((n, patch_size, patch_size, 3), np.uint8)
    c_paths = (ctypes.c_char_p * n)(*[p.encode() for p in paths])
    c_ys = (ctypes.c_int * n)(*ys)
    c_xs = (ctypes.c_int * n)(*xs)
    rc = lib.rcot_load_patches(
        c_paths, n, c_ys, c_xs, patch_size, nthreads,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte)))
    if rc:
        raise IOError(f"native patch load failed at {paths[rc - 1]}")
    return out
