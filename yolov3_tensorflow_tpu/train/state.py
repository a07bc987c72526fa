"""Train state pytree.

Functional replacement for the reference's scattered mutable state: model
weights + BN moving stats (Keras variables), optimizer slots (radam.py:69-75),
the rectified-loss image counter (yolov3_loss.py:69), and the augmentation
RNG (implicit TF graph seeds, run.py:27-28).  Everything lives in one pytree
so a checkpoint is a single atomic object (the reference saves weights only —
optimizer slots are silently rebuilt on resume, trainer.py:90-91).
"""
from __future__ import annotations

from typing import Any

import jax.numpy as jnp
from flax import struct


class TrainState(struct.PyTreeNode):
    step: jnp.ndarray
    params: Any
    batch_stats: Any
    opt_state: Any
    image_count: jnp.ndarray  # rectified-coord-loss counter
    rng: jnp.ndarray  # augmentation PRNG key
    # EMA shadow of ``params`` (Config.ema_decay > 0), else None.  None
    # contributes no pytree leaves, so EMA-less checkpoints keep their
    # exact historical layout.
    ema_params: Any = None

    @classmethod
    def create(cls, params, batch_stats, opt_state, rng, ema_params=None):
        return cls(step=jnp.zeros((), jnp.int32), params=params,
                   batch_stats=batch_stats, opt_state=opt_state,
                   image_count=jnp.zeros((), jnp.int32), rng=rng,
                   ema_params=ema_params)
