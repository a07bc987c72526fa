"""Learning-rate schedule.

Piecewise-constant by epoch, identical to the reference's ``lr_func``
(configs.py:23-27) driven by keras LearningRateScheduler per epoch
(trainer.py:94).  Here the schedule is a pure function of the global step
(epoch = step // steps_per_epoch) so it lives inside the jitted update.

Note: the reference constructs RAdam with a hardcoded lr=1e-3 ignoring
``init_lr`` (trainer.py:75), but LearningRateScheduler overwrites
``optimizer.lr`` at the start of EVERY epoch including epoch 0 — so the
effective trajectory is exactly the schedule for all optimizers.  We
reproduce the effective trajectory, not the accident.
"""
from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp
import numpy as np


def piecewise_epoch_schedule(step_epoch: Sequence[int],
                             step_lr: Sequence[float],
                             steps_per_epoch: int):
    """Returns f(step) -> lr.  lr_func semantics: first i with
    epoch <= step_epoch[i] selects step_lr[i]; beyond the last boundary the
    last lr holds (reference lr_func would index out of range there — the
    epoch budget never reaches it)."""
    boundaries = jnp.asarray(np.asarray(step_epoch, np.int32))
    lrs = jnp.asarray(np.asarray(step_lr, np.float32))

    def schedule(step):
        epoch = jnp.asarray(step, jnp.int32) // steps_per_epoch
        # lr_func uses `epoch > boundary[i]` to advance: index = number of
        # boundaries strictly below epoch
        idx = jnp.sum((epoch > boundaries).astype(jnp.int32))
        return lrs[jnp.minimum(idx, lrs.shape[0] - 1)]

    return schedule
