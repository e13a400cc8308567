"""Loss math for the RCOT minimax, quirk-exact to the reference.

Transport-map (T) objective (reference: trainer.py:318-343):
    T_loss = -mean(F(T(x)))
             + sigma * ( sqrt(mean(res^2)) + fourier_residual_penalty(res, de_id) )
             + [ Sigma * mean|T(x) - y|   if the iteration is in the paired phase ]
where res = x - T(x). The paired gate is iteration < pairnum // batch_size
(trainer.py:338) — pairnum interpolates unpaired<->paired per epoch
(SURVEY.md §2.2 #5). Implemented as a traced boolean so both phases share one
compiled program.

Critic (F) objective (reference: trainer.py:266-308):
    F_loss  = -mean(F(y)) + mean(F(T(x).detach()))
    GP      = 10 * mean((||dF/dx_hat||_2 - 1)^2),  x_hat = a*y + (1-a)*T(x)
with TWO sequential optimizer steps per iteration (WGAN loss first, the
gradient penalty against the already-updated critic second — SURVEY.md §2.2 #3).
The input-gradient is a first-class jax.grad here, no retain_graph gymnastics.
"""

from __future__ import annotations

from typing import Callable, Dict, Tuple

import jax
import jax.numpy as jnp

from ..ops.fourier import fourier_residual_penalty, residual_rmse


def t_loss(out: jax.Array, inp: jax.Array, target: jax.Array, de_id: jax.Array,
           critic_score: jax.Array, *, sigma: float, Sigma: float,
           paired: jax.Array, loss_math: str = "reference") -> Tuple[jax.Array, Dict]:
    """Transport-map loss. `paired` is a traced bool scalar."""
    res = inp - out
    rmse = residual_rmse(res)
    fourier = fourier_residual_penalty(res, de_id, loss_math)
    adv = -jnp.mean(critic_score)
    paired_l1 = jnp.mean(jnp.abs(out - target))
    loss = adv + sigma * (rmse + fourier) + jnp.where(paired, Sigma * paired_l1, 0.0)
    aux = {"t_adv": adv, "rmse": rmse, "fourier": fourier, "paired_l1": paired_l1}
    return loss, aux


def wgan_critic_loss(score_real: jax.Array, score_fake: jax.Array) -> jax.Array:
    """-mean F(real) + mean F(fake) (reference: trainer.py:268-276)."""
    return -jnp.mean(score_real) + jnp.mean(score_fake)


def gan_loss(scores: jax.Array, target_is_real: bool,
             mode: str = "lsgan") -> jax.Array:
    """GAN losses from the reference's (unused-by-main-path) GANLoss helper
    (reference: util/loss_utils.py:6-45): 'lsgan' = MSE to 1/0 labels,
    'vanilla' = BCE-with-logits, 'wgan' = +/- mean score."""
    if mode == "lsgan":
        target = jnp.ones_like(scores) if target_is_real else jnp.zeros_like(scores)
        return jnp.mean(jnp.square(scores - target))
    if mode == "vanilla":
        target = jnp.ones_like(scores) if target_is_real else jnp.zeros_like(scores)
        return jnp.mean(jnp.maximum(scores, 0) - scores * target
                        + jnp.log1p(jnp.exp(-jnp.abs(scores))))
    if mode == "wgan":
        return -jnp.mean(scores) if target_is_real else jnp.mean(scores)
    raise ValueError(f"unknown gan loss mode {mode!r}")


def tv_loss(x: jax.Array, weight: float = 1.0) -> jax.Array:
    """Total-variation regularizer: per-element mean of squared forward
    differences over height and width, NHWC, batch-averaged — the standard
    (jxgu1016) TVLoss the reference derives from.

    DELIBERATE deviation: the reference's copy (utils.py:59-72, dead on the
    main path) squeezes to CHW but keeps the 4-D snippet's dim-0/1 indexing,
    so its 'h_tv' actually differences CHANNELS and its 'w_tv' differences
    HEIGHT, each over the other's element count — scrambled beyond intent.
    We implement the math the snippet intends rather than reproduce a
    broken dead branch (SURVEY.md §2.2 quirks policy: bugs with no training
    effect are fixed and documented)."""
    b, h, w, c = x.shape
    dh = jnp.sum(jnp.square(x[:, 1:, :, :] - x[:, :-1, :, :]))
    dw = jnp.sum(jnp.square(x[:, :, 1:, :] - x[:, :, :-1, :]))
    count_h = c * (h - 1) * w
    count_w = c * h * (w - 1)
    return weight * 2.0 * (dh / count_h + dw / count_w) / b


def gradient_penalty(critic_fn: Callable[[jax.Array], jax.Array],
                     real: jax.Array, fake: jax.Array, key: jax.Array,
                     weight: float = 10.0) -> jax.Array:
    """WGAN-GP on per-sample interpolates (reference: trainer.py:283-305).

    critic_fn: x (B,H,W,C) -> (B,) scores. The norm is over all non-batch dims.
    """
    b = real.shape[0]
    alpha = jax.random.uniform(key, (b, 1, 1, 1), dtype=real.dtype)
    x_hat = alpha * real + (1.0 - alpha) * fake
    # d/dx of sum(F(x)) gives per-sample input gradients in one pass.
    grads = jax.grad(lambda x: jnp.sum(critic_fn(x)))(x_hat)
    norms = jnp.sqrt(jnp.sum(jnp.square(grads.reshape(b, -1)), axis=1))
    return weight * jnp.mean(jnp.square(norms - 1.0))
