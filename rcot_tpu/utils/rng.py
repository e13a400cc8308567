"""PRNG plumbing: jax keys for traced code, a numpy-backed HostKey for init.

Initializing the 77M-param model takes ~1400 RNG draws of distinct shapes.
As eager jax ops each pays an XLA mini-compile (~100ms -> minutes total); as
one jitted program XLA chews on 1400 threefry subgraphs (also minutes). A
numpy SeedSequence tree does it in milliseconds with identical distributions.

All `init_*` functions accept either a jax PRNG key (needed under jit /
eval_shape) or a HostKey; the helpers here dispatch on type.
"""

from __future__ import annotations

from typing import Sequence, Union

import jax
import numpy as np


class HostKey:
    """numpy-backed stand-in for a jax PRNG key (splittable, one-shot use)."""

    __slots__ = ("_ss",)

    def __init__(self, seed_or_ss: Union[int, np.random.SeedSequence]):
        if isinstance(seed_or_ss, np.random.SeedSequence):
            self._ss = seed_or_ss
        else:
            self._ss = np.random.SeedSequence(int(seed_or_ss))

    def split(self, n: int) -> Sequence["HostKey"]:
        return [HostKey(ss) for ss in self._ss.spawn(n)]

    def generator(self) -> np.random.Generator:
        return np.random.default_rng(self._ss)


KeyLike = Union[jax.Array, HostKey]


def ensure_host(key: KeyLike) -> KeyLike:
    """Concrete jax key -> HostKey (numpy fast path); tracers pass through.

    Top-level init entry points call this so eager initialization never
    dispatches hundreds of tiny RNG ops to a device, while jit/eval_shape
    tracing keeps the jax.random path.
    """
    if isinstance(key, HostKey) or isinstance(key, jax.core.Tracer):
        return key
    data = np.asarray(jax.random.key_data(key)).ravel()
    seed = int.from_bytes(data.tobytes()[:8], "little")
    return HostKey(seed)


def split(key: KeyLike, n: int = 2):
    if isinstance(key, HostKey):
        return key.split(n)
    return jax.random.split(key, n)


def uniform(key: KeyLike, shape, dtype, lo: float, hi: float):
    if isinstance(key, HostKey):
        arr = key.generator().uniform(lo, hi, size=shape)
        return np.asarray(arr, dtype=np.dtype(dtype))
    return jax.random.uniform(key, shape, dtype, lo, hi)


def normal(key: KeyLike, shape, dtype):
    if isinstance(key, HostKey):
        return np.asarray(key.generator().standard_normal(size=shape),
                          dtype=np.dtype(dtype))
    return jax.random.normal(key, shape, dtype)
