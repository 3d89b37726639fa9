"""Jitted train step + host-side epoch loop.

Re-designs /root/reference/detection/engine.py:19-61 (train_one_epoch): the body
becomes one compiled program per canvas shape; the loss-dict sum, gradient, and
update happen on device. Data parallelism needs no special code here: shard the
batch over the mesh (``cald_tpu.parallel.shard_batch``) and XLA inserts the
gradient all-reduce (replaces reduce_dict/NCCL, utils.py:118-142).

The NaN guard (engine.py:46-49 exits the process) becomes a returned flag the
caller checks — device-to-host sync happens once per log interval, not per step.
"""

from __future__ import annotations

import time
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np

from cald_tpu.engine.logging import MetricLogger
from cald_tpu.engine.state import TrainState


def make_train_step(model, *, loss_weights: dict | None = None) -> Callable:
    """Returns jitted step(state, images, valid_hw, gt_boxes, gt_labels,
    gt_valid, rng) -> (state, metrics dict of scalars)."""

    def step_fn(state: TrainState, images, valid_hw, gt_boxes, gt_labels,
                gt_valid, rng):
        def loss_fn(params):
            variables = {"params": params}
            if state.frozen:
                variables["frozen"] = state.frozen
            losses, _ = model.apply(variables, images, valid_hw, gt_boxes,
                                    gt_labels, gt_valid, method="loss",
                                    rngs={"sampling": rng})
            if loss_weights:
                total = sum(losses[k] * w for k, w in loss_weights.items())
            else:
                total = sum(losses.values())
            return total, losses

        (total, losses), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params)
        new_state = state.apply_gradients(grads)
        metrics = dict(losses)
        metrics["loss"] = total
        return new_state, metrics

    return jax.jit(step_fn, donate_argnums=(0,))


def train_one_epoch(state: TrainState, step_fn: Callable, loader, rng_key,
                    *, epoch: int, cycle: int = 0, print_freq: int = 20,
                    logger: MetricLogger | None = None):
    """Host loop over one epoch. Returns (state, last_metrics).

    Raises FloatingPointError on non-finite loss (the reference calls
    sys.exit(1), engine.py:46-49 — raising lets callers decide).
    """
    logger = logger or MetricLogger(delimiter="  ")
    header = f"Cycle: [{cycle}] Epoch: [{epoch}]"
    metrics = {}
    for i, batch in enumerate(logger.log_every(loader, print_freq, header)):
        rng = jax.random.fold_in(rng_key, int(state.step))
        state, metrics = step_fn(
            state, jnp.asarray(batch.images), jnp.asarray(batch.valid_hw),
            jnp.asarray(batch.boxes), jnp.asarray(batch.labels),
            jnp.asarray(batch.box_valid), rng)
        if i % print_freq == 0:
            host = {k: float(v) for k, v in metrics.items()}
            if not np.isfinite(host["loss"]):
                raise FloatingPointError(f"Loss is {host['loss']}, stopping "
                                         f"(losses: {host})")
            logger.update(**host)
    return state, metrics
