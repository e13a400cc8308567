"""The jitted minimax train steps.

One reference training iteration (reference: trainer.py:247-346) becomes two
compiled XLA programs, each a pure function of (state, batch, key):

  f_step: critic forward on target + T(x) (stop-gradient), WGAN loss, RMSprop
          update #1; then gradient penalty at the UPDATED critic params
          (matching the reference's two sequential optimizer steps,
          trainer.py:279-280 then :283-308) and RMSprop update #2.
  t_step: T two-pass forward + critic score (critic params frozen — they are
          simply not differentiated; no freeze/unfreeze mutation) + Fourier OT
          cost + optional paired L1, one update of the T params.

freeze()/unfreeze() (reference: utils.py:23-31) disappears: T and F live in
separate param trees and each step differentiates only its own.

Data parallelism: both steps are written for a `jax.sharding.Mesh` with a
'data' axis. Gradients need no explicit psum — the steps are jit-compiled with
batch inputs sharded over 'data' and params replicated, and XLA inserts the
reduction. See rcot_tpu/parallel/sharding.py.
"""

from __future__ import annotations

from typing import Any, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from ..models.critic import apply_fnet
from ..models.restormer import apply_tnet
from ..utils.config import Config
from .losses import gradient_penalty, t_loss, wgan_critic_loss
from .optim import make_optimizer


def make_model_apply(cfg: Config, *, full: bool = False):
    """The configured T backbone (cfg.model.backbone: flagship Restormer or
    the legacy MPRNet one) as fn(t_params, x) -> out2, or with full=True
    -> (out2, out1, res)."""
    if cfg.model.backbone == "mprnet":
        from ..models.mprnet import apply_mprnet_tnet

        def fn3(tp, x):
            # latent_cond_scale is the same conditioning knob the Restormer
            # backbone reads (Net.py:212's 0.8 == Net_Restormer.py:401's)
            return apply_mprnet_tnet(
                tp, x, residual_cond_scale=cfg.model.latent_cond_scale)
    elif cfg.model.backbone == "restormer":
        def fn3(tp, x):
            return apply_tnet(tp, x, cfg.model)
    else:
        raise ValueError(f"unknown backbone {cfg.model.backbone!r}")
    return fn3 if full else (lambda tp, x: fn3(tp, x)[0])


class TrainState(NamedTuple):
    """Full resumable training state (a pytree of arrays)."""
    t_params: Any
    f_params: Any
    t_opt: Any
    f_opt: Any
    step: jax.Array  # global iteration counter; the epoch lives in
    # checkpoint METADATA (trainer.save), not in device state — the loop
    # owns it and nothing device-side reads it


class Batch(NamedTuple):
    degraded: jax.Array  # (B, H, W, C) float in [0, 1]
    target: jax.Array    # (B, H, W, C) float in [0, 1]
    de_id: jax.Array     # (B,) int32


def create_train_state(key: jax.Array, cfg: Config, dtype=jnp.float32,
                       *, jit: bool = False, device=None) -> TrainState:
    """Build the initial TrainState.

    The init is ~1400 small RNG ops: running them eagerly against a
    remote-attached TPU pays a dispatch round-trip each (minutes), and
    jit-compiling them into one program makes XLA chew on 1400 threefry
    subgraphs (also minutes). So we build eagerly on the LOCAL CPU backend —
    microsecond dispatch — and transfer the finished pytree to `device`
    (default: jax.devices()[0]) in one hop. Under jax.eval_shape (template
    building) no backend is touched at all.
    """
    from ..models.critic import init_fnet
    from ..models.restormer import init_tnet

    def build(key):
        kt, kf = jax.random.split(key)
        if cfg.model.backbone == "mprnet":
            from ..models.mprnet import init_mprnet_tnet
            t_params = init_mprnet_tnet(
                kt, n_feat=cfg.model.mprnet_n_feat,
                scale_unetfeats=cfg.model.mprnet_scale_feats, dtype=dtype)
        else:
            t_params = init_tnet(kt, cfg.model, dtype)
        f_params = init_fnet(kf, cfg.critic, dtype)
        t_tx, f_tx = make_optimizers(cfg)
        return TrainState(
            t_params=t_params,
            f_params=f_params,
            t_opt=t_tx.init(t_params),
            f_opt=f_tx.init(f_params),
            step=jnp.zeros((), jnp.int32),
        )

    if jit:
        return jax.jit(build)(key)
    if isinstance(key, jax.core.Tracer):  # eval_shape / inside-trace path
        return build(key)
    try:
        cpu = jax.local_devices(backend="cpu")[0]
    except RuntimeError:
        cpu = None
    if cpu is not None:
        # The key itself must live on CPU or every downstream eager op
        # follows it back to the accelerator.
        key = jax.device_put(key, cpu)
        with jax.default_device(cpu):
            state = build(key)
        target = device if device is not None else jax.devices()[0]
        if target.platform != "cpu":
            state = jax.device_put(state, target)
        return state
    return build(key)


def make_optimizers(cfg: Config):
    # T uses lr/2, F uses lr (reference: trainer.py:122-126); actual decayed
    # LRs are injected per-step via opt_state.hyperparams.
    t_tx = make_optimizer(cfg.train.optimizer, cfg.train.lr / 2)
    f_tx = make_optimizer(cfg.train.optimizer, cfg.train.lr)
    return t_tx, f_tx


def _set_lr(opt_state, lr):
    """Return a new InjectHyperparams state with the given learning rate."""
    hp = dict(opt_state.hyperparams)
    hp["learning_rate"] = jnp.asarray(lr, jnp.float32)
    return opt_state._replace(hyperparams=hp)


def make_f_step(cfg: Config):
    """Critic step: WGAN update then GP update (two optimizer steps)."""
    _, f_tx = make_optimizers(cfg)
    model_apply = make_model_apply(cfg)

    def f_step(state: TrainState, batch: Batch, key: jax.Array, lr: jax.Array,
               fake: Optional[jax.Array] = None,
               ) -> Tuple[TrainState, Dict[str, jax.Array]]:
        if fake is None:
            # T forward, detached (reference uses .data, trainer.py:272).
            out = model_apply(state.t_params, batch.degraded)
            fake = jax.lax.stop_gradient(out)

        def wgan(fp):
            # one batched critic forward for real+fake (XLA won't merge two
            # separate batch-3 calls; batch-6 keeps the MXU busier)
            scores = apply_fnet(
                fp, jnp.concatenate([batch.target, fake], axis=0), cfg.critic)
            b = batch.target.shape[0]
            return wgan_critic_loss(scores[:b], scores[b:])

        f_opt = _set_lr(state.f_opt, lr)
        loss_w, grads = jax.value_and_grad(wgan)(state.f_params)
        upd, f_opt = f_tx.update(grads, f_opt, state.f_params)
        f_params = optax.apply_updates(state.f_params, upd)

        # Gradient penalty at the updated critic (SURVEY.md §2.2 #3).
        def gp(fp):
            return gradient_penalty(
                lambda x: apply_fnet(fp, x, cfg.critic),
                batch.target, fake, key, cfg.train.gp_weight)

        from ..ops import dispatch
        if dispatch.ablate("gp"):  # measurement-only (ops/dispatch.py)
            loss_gp = jnp.zeros(())
        else:
            loss_gp, grads = jax.value_and_grad(gp)(f_params)
            upd, f_opt = f_tx.update(grads, f_opt, f_params)
            f_params = optax.apply_updates(f_params, upd)

        new_state = state._replace(f_params=f_params, f_opt=f_opt)
        return new_state, {"f_wgan": loss_w, "f_gp": loss_gp}

    return f_step


def make_t_step(cfg: Config):
    """Transport-map step: two-pass forward + OT cost, one update."""
    t_tx, _ = make_optimizers(cfg)
    model_apply = make_model_apply(cfg)

    def t_step(state: TrainState, batch: Batch, paired: jax.Array, lr: jax.Array
               ) -> Tuple[TrainState, Dict[str, jax.Array]]:
        def loss_fn(tp):
            out = model_apply(tp, batch.degraded)
            score = apply_fnet(state.f_params, out, cfg.critic)
            loss, aux = t_loss(
                out, batch.degraded, batch.target, batch.de_id, score,
                sigma=cfg.train.sigma, Sigma=cfg.train.Sigma,
                paired=paired, loss_math=cfg.train.loss_math)
            return loss, aux

        t_opt = _set_lr(state.t_opt, lr)
        (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.t_params)
        upd, t_opt = t_tx.update(grads, t_opt, state.t_params)
        t_params = optax.apply_updates(state.t_params, upd)

        new_state = state._replace(
            t_params=t_params, t_opt=t_opt, step=state.step + 1)
        metrics = {"t_loss": loss, **aux}
        return new_state, metrics

    return t_step


def make_train_iteration(cfg: Config):
    """One full minimax iteration (f_step then t_step) as a single jittable fn.

    Used by the trainer and by dryrun_multichip; callers jit it with sharding
    annotations (see parallel/sharding.py) or plain jax.jit single-chip.

    Single-T-forward structure: the reference runs the two-pass T forward
    twice per iteration — once detached for the critic's fake batch
    (trainer.py:271-272) and once differentiated in the T-sub (trainer.py:318).
    Both use the SAME T params (the f-step only updates F), so the values are
    identical; here ONE jax.vjp forward serves both: its primal is the
    critic's (stop-gradient) fake, and its vjp closes the t-step's gradient
    chain. Measured on v5e this removes a full two-pass forward (~33 ms) the
    XLA CSE pass was not eliminating. RCOT_SINGLE_FWD=0 restores the naive
    two-forward composition (A/B measurement only — same math either way).
    """
    import os

    f_step = make_f_step(cfg)
    t_step = make_t_step(cfg)

    if os.environ.get("RCOT_SINGLE_FWD", "1") in ("", "0"):
        def iteration(state: TrainState, batch: Batch, key: jax.Array,
                      paired: jax.Array, lr: jax.Array):
            state, f_metrics = f_step(state, batch, key, lr)
            state, t_metrics = t_step(state, batch, paired, lr / 2)
            return state, {**f_metrics, **t_metrics}

        return iteration

    t_tx, _ = make_optimizers(cfg)
    model_apply = make_model_apply(cfg)

    def iteration(state: TrainState, batch: Batch, key: jax.Array,
                  paired: jax.Array, lr: jax.Array):
        out2, t_vjp = jax.vjp(
            lambda tp: model_apply(tp, batch.degraded), state.t_params)

        state, f_metrics = f_step(state, batch, key, lr,
                                  fake=jax.lax.stop_gradient(out2))

        # t-step against the UPDATED critic (reference ordering), chained
        # through the hoisted forward's vjp.
        def post(out):
            score = apply_fnet(state.f_params, out, cfg.critic)
            return t_loss(
                out, batch.degraded, batch.target, batch.de_id, score,
                sigma=cfg.train.sigma, Sigma=cfg.train.Sigma,
                paired=paired, loss_math=cfg.train.loss_math)

        (loss, aux), g_out = jax.value_and_grad(post, has_aux=True)(out2)
        grads = t_vjp(g_out)[0]
        t_opt = _set_lr(state.t_opt, lr / 2)
        upd, t_opt = t_tx.update(grads, t_opt, state.t_params)
        t_params = optax.apply_updates(state.t_params, upd)
        state = state._replace(
            t_params=t_params, t_opt=t_opt, step=state.step + 1)
        return state, {**f_metrics, "t_loss": loss, **aux}

    return iteration
