"""LL4AL: learning-loss active learning (/root/reference/ll_train.py).

Joint training: the detector produces PER-IMAGE loss vectors (frcnn_ll.py:29-64
unreduced variants — our models' per_image=True mode) whose sum is the target
for a LossNet ranking head over the FPN features; after ``task_epochs`` the
features feeding LossNet are detached (ll_train.py:90-95). Scoring = LossNet
prediction on the pool; selection = top-budget DESCENDING (ll_train.py:278-284).
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np

from cald_tpu.models.lossnet import loss_pred_loss


def make_ll_train_step(model, lossnet, *, ll_weight: float = 1.0,
                       margin: float = 1.0, num_levels: int = 4) -> Callable:
    """Returns jitted step(task_state, ll_state, batch arrays, rng,
    detach_features: bool static) -> (task_state, ll_state, metrics)."""

    def step(task_state, ll_state, images, valid_hw, gt_boxes, gt_labels,
             gt_valid, rng, detach_features: bool):
        def loss_fn(task_params, ll_params):
            variables = {"params": task_params}
            if task_state.frozen:
                variables["frozen"] = task_state.frozen
            losses, pyramid = model.apply(
                variables, images, valid_hw, gt_boxes, gt_labels, gt_valid,
                method="loss", per_image=True, rngs={"sampling": rng})
            per_image = sum(losses.values())                  # (B,)
            feats = pyramid[:num_levels]
            if detach_features:
                feats = [jax.lax.stop_gradient(f) for f in feats]
            pred = lossnet.apply({"params": ll_params}, feats)
            ll = loss_pred_loss(pred, per_image, margin=margin)
            task_loss = jnp.mean(per_image)
            total = task_loss + ll_weight * ll
            return total, {"task_loss": task_loss, "ll_loss": ll}

        (total, metrics), (g_task, g_ll) = jax.value_and_grad(
            loss_fn, argnums=(0, 1), has_aux=True)(task_state.params,
                                                   ll_state.params)
        metrics["loss"] = total
        return (task_state.apply_gradients(g_task),
                ll_state.apply_gradients(g_ll), metrics)

    return jax.jit(step, static_argnames=("detach_features",))


def make_ll_score_fn(model, lossnet, *, num_levels: int = 4) -> Callable:
    """jitted fn(task_variables, ll_params, images, valid_hw) -> predicted
    losses (B,) (ll_train.py:145-166 runs LossNet on eval-mode features)."""

    def fn(task_variables, ll_params, images, valid_hw):
        pyramid = model.apply(task_variables, images, valid_hw,
                              method="extract_features")
        return lossnet.apply({"params": ll_params}, pyramid[:num_levels])

    return jax.jit(fn)


def ll_scores(score_fn: Callable, task_variables, ll_params, loader,
              pool_indices) -> np.ndarray:
    pos = {int(idx): i for i, idx in enumerate(pool_indices)}
    out = np.zeros((len(pool_indices),))
    for batch in loader:
        p = np.asarray(score_fn(task_variables, ll_params,
                                jnp.asarray(batch.images),
                                jnp.asarray(batch.valid_hw)))
        for i, idx in enumerate(batch.image_idx):
            out[pos[int(idx)]] = p[i]
    return out


def ll_select(pred_losses: np.ndarray, budget: int) -> np.ndarray:
    """Top-budget by predicted loss, descending (ll_train.py:278-284)."""
    return np.argsort(-pred_losses, kind="stable")[:budget]
