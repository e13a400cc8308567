"""Parameter initializers matching PyTorch default semantics.

The reference relies on torch's default inits for every layer except the
critic's convolutions, which it overrides to N(0, 0.02) (reference:
Net_Restormer.py:501-506). Matching the init distribution matters for
training-dynamics parity, so we reproduce:

- torch.nn.Conv2d / Linear default: kaiming_uniform(a=sqrt(5)) on the weight,
  which reduces to U(-1/sqrt(fan_in), 1/sqrt(fan_in)); bias is
  U(-1/sqrt(fan_in), 1/sqrt(fan_in)).

All initializers accept either a jax PRNG key or a utils.rng.HostKey (numpy
fast path — eager jax init of ~1400 distinct-shape draws costs minutes of
mini-compiles; numpy costs milliseconds).
"""

from __future__ import annotations

import jax.numpy as jnp

from ..utils import rng as rnglib


def torch_conv_weight(key, kh: int, kw: int, cin: int, cout: int, groups: int = 1,
                      dtype=jnp.float32):
    """HWIO conv weight with torch's default kaiming_uniform(a=sqrt(5)) init.

    fan_in is computed from the torch OIHW weight shape (cout, cin/groups, kh, kw):
    fan_in = (cin/groups) * kh * kw.
    """
    fan_in = (cin // groups) * kh * kw
    bound = 1.0 / (fan_in ** 0.5)
    return rnglib.uniform(key, (kh, kw, cin // groups, cout), dtype, -bound, bound)


def torch_conv_bias(key, kh: int, kw: int, cin: int, cout: int, groups: int = 1,
                    dtype=jnp.float32):
    fan_in = (cin // groups) * kh * kw
    bound = 1.0 / (fan_in ** 0.5)
    return rnglib.uniform(key, (cout,), dtype, -bound, bound)


def torch_linear_weight(key, fin: int, fout: int, dtype=jnp.float32):
    """(fin, fout) weight (we store the transpose of torch's (fout, fin))."""
    bound = 1.0 / (fin ** 0.5)
    return rnglib.uniform(key, (fin, fout), dtype, -bound, bound)


def torch_linear_bias(key, fin: int, fout: int, dtype=jnp.float32):
    bound = 1.0 / (fin ** 0.5)
    return rnglib.uniform(key, (fout,), dtype, -bound, bound)


def normal_conv_weight(key, kh: int, kw: int, cin: int, cout: int, groups: int = 1,
                       std: float = 0.02, dtype=jnp.float32):
    """N(0, std) conv weight (critic init, reference: Net_Restormer.py:501-503)."""
    return std * rnglib.normal(key, (kh, kw, cin // groups, cout), dtype)
