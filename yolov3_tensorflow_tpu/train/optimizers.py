"""Optimizers (reference: yolov3/trainer.py:69-75 and utils/radam.py:13-119).

The reference offers SGDM (momentum .95, nesterov), Adam with AMSGrad, and
a hand-written RAdam.  Here they are optax transformations; RAdam is
reimplemented from the reference's math (not optax.radam, whose warmup
fallback differs):

  rho_inf = 2/(1-b2) - 1                                (radam.py:54)
  rho_t   = rho_inf - 2 t b2^t / (1 - b2^t)             (radam.py:79)
  rho_t >= 5:  step = r_t * sqrt(1-b2^t)/(1-b1^t) * m_t/(sqrt(v_t)+eps)
     with r_t = sqrt((rho_t-4)(rho_t-2)rho_inf /
                     ((rho_inf-4)(rho_inf-2) rho_t))    (radam.py:81-84)
  else:        step = warmup_coef/(1-b1^t) * m_t        (radam.py:85)
  amsgrad uses vhat = max(vhat, v_t)                    (radam.py:91-94)

eps defaults to the Keras epsilon the reference sets to 1e-8 (run.py:26).
The learning rate comes from the epoch-piecewise schedule (schedule.py)
for every optimizer; WHERE it enters differs per optimizer to match the
reference exactly: keras SGD folds lr into the velocity update itself
(v = momentum*v - lr*g), so for sgdm the schedule scales the gradient
BEFORE the momentum trace — applying it after would rescale the whole
momentum history at every schedule boundary (a 10x lr jump would
transiently take ~10x-too-large steps until the old velocity decays).
Adam/RAdam apply lr to the current step only in the reference too, so
there the schedule scales the final update.
"""
from __future__ import annotations

from typing import NamedTuple, Optional

import chex
import jax
import jax.numpy as jnp
import optax

from ..config import Config
from .schedule import piecewise_epoch_schedule


class ScaleByRAdamState(NamedTuple):
    count: chex.Array
    mu: optax.Updates
    nu: optax.Updates
    nu_hat: optax.Updates


def scale_by_radam(b1: float = 0.9, b2: float = 0.999, eps: float = 1e-8,
                   amsgrad: bool = False,
                   warmup_coef: float = 1.0) -> optax.GradientTransformation:
    """Rectified Adam step direction (to be scaled by -lr)."""
    rho_inf = 2.0 / (1.0 - b2) - 1.0

    def init_fn(params):
        zeros = lambda: jax.tree.map(jnp.zeros_like, params)
        return ScaleByRAdamState(count=jnp.zeros([], jnp.int32),
                                 mu=zeros(), nu=zeros(),
                                 nu_hat=zeros() if amsgrad else None)

    def update_fn(updates, state, params=None):
        del params
        count = state.count + 1
        t = count.astype(jnp.float32)
        mu = jax.tree.map(lambda m, g: b1 * m + (1 - b1) * g,
                          state.mu, updates)
        nu = jax.tree.map(lambda v, g: b2 * v + (1 - b2) * jnp.square(g),
                          state.nu, updates)
        b1t = jnp.power(b1, t)
        b2t = jnp.power(b2, t)
        rho_t = rho_inf - 2.0 * t * b2t / (1.0 - b2t)
        rect = jnp.sqrt((rho_t - 4.0) * (rho_t - 2.0) * rho_inf /
                        ((rho_inf - 4.0) * (rho_inf - 2.0)
                         * jnp.maximum(rho_t, 1e-12)))
        adaptive = rho_t >= 5.0
        var_coef = jnp.where(adaptive,
                             rect * jnp.sqrt(1.0 - b2t) / (1.0 - b1t),
                             warmup_coef / (1.0 - b1t))
        if amsgrad:
            nu_hat = jax.tree.map(jnp.maximum, state.nu_hat, nu)
            denom_tree = nu_hat
        else:
            nu_hat = None
            denom_tree = nu
        new_updates = jax.tree.map(
            lambda m, v: var_coef * jnp.where(
                adaptive, m / (jnp.sqrt(v) + eps), m),
            mu, denom_tree)
        return new_updates, ScaleByRAdamState(count, mu, nu, nu_hat)

    return optax.GradientTransformation(init_fn, update_fn)


def make_optimizer(cfg: Config,
                   steps_per_epoch: Optional[int] = None,
                   schedule=None):
    """Build (tx, schedule_fn) for the configured optimizer
    (trainer.py:70-75).

    With ``cfg.grad_accum_steps > 1`` the transformation is wrapped in
    ``optax.MultiSteps``: gradients are averaged over k micro-batches
    and the inner optimizer (whose step count the LR schedule reads)
    advances once per k.  The returned schedule_fn still maps MICRO
    steps (the trainer's ``state.step``) to the lr in effect, so
    callers need not know k.

    ``schedule``: optional step->lr override replacing the config's
    epoch-piecewise schedule (tools/lr_range_test.py sweeps an
    exponential ramp this way); evaluated on MACRO (optimizer) steps.
    """
    spe = steps_per_epoch or cfg.steps_per_epoch
    k = max(1, int(cfg.grad_accum_steps))
    if schedule is None:
        # the schedule is evaluated on the inner optimizer's count, which
        # advances once per macro step — an epoch is spe//k macro steps
        schedule = piecewise_epoch_schedule(
            cfg.step_epoch, cfg.step_lr, max(1, spe // k))
    name = cfg.optimizer
    parts = []
    if cfg.grad_clip_norm:
        parts.append(optax.clip_by_global_norm(cfg.grad_clip_norm))
    if name == "sgdm":
        # lr-before-trace: see module docstring (keras SGD.get_updates
        # semantics — the velocity carries each step's own lr)
        parts += [optax.scale_by_schedule(schedule),
                  optax.trace(decay=0.95, nesterov=True),
                  optax.scale(-1.0)]
    elif name == "adam":
        parts += [optax.scale_by_amsgrad(b1=0.9, b2=0.999, eps=cfg.epsilon),
                  optax.scale_by_schedule(lambda step: -schedule(step))]
    elif name == "radam":
        parts += [scale_by_radam(eps=cfg.epsilon),
                  optax.scale_by_schedule(lambda step: -schedule(step))]
    else:
        raise ValueError(f"unknown optimizer {name!r}")
    tx = optax.chain(*parts)
    if k > 1:
        tx = optax.MultiSteps(tx, every_k_schedule=k)
        return tx, (lambda step: schedule(step // k))
    return tx, schedule
