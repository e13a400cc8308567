"""Optimizers with torch-parity semantics, as optax GradientTransformations.

The reference trains both nets with torch.optim.RMSprop at defaults
(alpha=0.99, eps=1e-8, no momentum, not centered; reference: trainer.py:124-126)
or Adam (trainer.py:121-123). optax's rmsprop defaults differ (decay=0.9, eps
added inside the sqrt in some versions), so we implement the torch update rule
explicitly:

    square_avg = alpha * square_avg + (1 - alpha) * g^2
    param     -= lr * g / (sqrt(square_avg) + eps)

The learning rate is injected per-step (optax.inject_hyperparams) so the
reference's epoch-indexed step decay lr * 0.1**(epoch // step)
(trainer.py:228-231,235-243) never triggers recompilation.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import optax


class RMSPropTorchState(NamedTuple):
    square_avg: optax.Params


def scale_by_rms_torch(alpha: float = 0.99, eps: float = 1e-8) -> optax.GradientTransformation:
    def init_fn(params):
        return RMSPropTorchState(
            square_avg=jax.tree_util.tree_map(jnp.zeros_like, params))

    def update_fn(updates, state, params=None):
        del params
        sq = jax.tree_util.tree_map(
            lambda s, g: alpha * s + (1.0 - alpha) * jnp.square(g),
            state.square_avg, updates)
        upd = jax.tree_util.tree_map(
            lambda g, s: g / (jnp.sqrt(s) + eps), updates, sq)
        return upd, RMSPropTorchState(square_avg=sq)

    return optax.GradientTransformation(init_fn, update_fn)


def make_optimizer(name: str, lr: float = 1.0) -> optax.GradientTransformation:
    """Build a torch-parity optimizer with an injectable learning rate.

    The returned transform exposes `.hyperparams['learning_rate']` via
    optax.inject_hyperparams; pass the decayed LR each step.
    """
    if name == "RMSprop":
        def _make(learning_rate):
            return optax.chain(
                scale_by_rms_torch(),
                optax.scale_by_learning_rate(learning_rate),  # scales by -lr
            )
    elif name == "Adam":
        def _make(learning_rate):
            # torch Adam defaults: betas=(0.9, 0.999), eps=1e-8, update
            # m_hat / (sqrt(v_hat) + eps) — matches optax.scale_by_adam.
            return optax.chain(
                optax.scale_by_adam(b1=0.9, b2=0.999, eps=1e-8),
                optax.scale_by_learning_rate(learning_rate),
            )
    else:
        raise ValueError(f"unknown optimizer {name!r}")
    return optax.inject_hyperparams(_make)(learning_rate=lr)


def step_decay_lr(base_lr: float, epoch: jax.Array | int, step: int) -> jax.Array:
    """lr * 0.1**(epoch // step), epoch 0-based as the reference passes epoch-1
    (trainer.py:235 calls adjust_learning_rate(..., epoch - 1))."""
    return base_lr * jnp.power(0.1, jnp.asarray(epoch) // step)
