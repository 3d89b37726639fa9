"""LR schedules matching the reference's training recipe.

MultiStepLR(milestones=[16, 19], gamma=0.1) stepped per EPOCH
(/root/reference/cald_train.py:399-412) combined with a linear warmup over the
first 1000 iterations of epoch 0 from factor 1/1000
(cald_train.py:48-51, detection/utils.py:239-247).
"""

from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp


def warmup_factor(step: jnp.ndarray, warmup_iters: int, warmup_factor0: float):
    """Linear 1/1000 -> 1 over warmup_iters (utils.py:239-247)."""
    alpha = jnp.minimum(step.astype(jnp.float32), warmup_iters) / warmup_iters
    return warmup_factor0 * (1.0 - alpha) + alpha


def multistep_with_warmup(base_lr: float, steps_per_epoch: int,
                          milestones: Sequence[int] = (16, 19),
                          gamma: float = 0.1, warmup_iters: int = 1000,
                          warmup_factor0: float = 1.0 / 1000.0):
    """optax-style schedule fn(step) -> lr, step counted in iterations.

    Matches the reference exactly: warmup only during epoch 0 (and capped at
    min(1000, steps_per_epoch - 1) iters like warmup_lr_scheduler is invoked,
    cald_train.py:49-50), epoch-granular decay at each milestone.
    """
    wi = max(1, min(warmup_iters, steps_per_epoch - 1)) if steps_per_epoch > 1 else 1
    ms = jnp.asarray(sorted(milestones), jnp.int32)

    def schedule(step):
        step = jnp.asarray(step)
        epoch = step // steps_per_epoch
        decay = gamma ** jnp.sum(epoch >= ms)
        wf = jnp.where(epoch == 0, warmup_factor(step, wi, warmup_factor0), 1.0)
        return base_lr * decay * wf

    return schedule
