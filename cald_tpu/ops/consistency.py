"""The CALD consistency metric as one batched, fixed-shape kernel.

Replaces the reference's per-image Python/NumPy/scipy loop
(/root/reference/cald_train.py:184-228) with a single vectorized computation over
``(batch, augs, boxes)``:

  per (image b, aug a, reference box j):
      iou_row  = IoU(aug_box[b,a,j], det_boxes[b,a,:])   (unclamped variant)
      best     = argmax(iou_row)
      js       = JS(ref_scores_cls[b,j], det_scores_cls[b,a,best])
      value    = | max(iou_row) + 0.5*(1-js)*(pm_ref[b,j] + pm_det[b,a,best]) - bp |
  consistency[b, a] = min(1.0, min over valid j of value)     (0.0 if aug a has no dets)
  consistency[b]    = mean over augs
  (images with no reference detections score 0.0 — handled by ``ref_any``)

All detection sets use K fixed slots + validity masks.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from cald_tpu.ops.boxes import pairwise_iou_nocheck
from cald_tpu.ops.divergence import js_divergence


@partial(jax.jit, static_argnames=())
def cald_consistency(
    aug_boxes: jnp.ndarray,        # (B, A, K, 4) reference boxes mapped through each aug
    ref_scores_cls: jnp.ndarray,   # (B, K, C)
    ref_prob_max: jnp.ndarray,     # (B, K)
    ref_valid: jnp.ndarray,        # (B, K) bool
    det_boxes: jnp.ndarray,        # (B, A, K, 4) detections on augmented images
    det_scores_cls: jnp.ndarray,   # (B, A, K, C)
    det_prob_max: jnp.ndarray,     # (B, A, K)
    det_valid: jnp.ndarray,        # (B, A, K) bool
    base_point: jnp.ndarray,       # scalar bp (default 1.3 in the reference CLI)
) -> jnp.ndarray:
    """Returns per-image consistency scores, shape (B,)."""
    # IoU of every transformed reference box against every detection: (B, A, K, K).
    iou = jax.vmap(jax.vmap(pairwise_iou_nocheck, in_axes=(0, None)), in_axes=(0, 0))(
        aug_boxes.reshape(-1, aug_boxes.shape[2], 4),
        det_boxes.reshape(-1, det_boxes.shape[2], 4),
    ).reshape(aug_boxes.shape[:3] + (det_boxes.shape[2],))

    # Invalid detections must never win the argmax (reference has no padding).
    iou = jnp.where(det_valid[:, :, None, :], iou, -1.0)
    best = jnp.argmax(iou, axis=-1)                       # (B, A, K)
    max_iou = jnp.clip(jnp.max(iou, axis=-1), 0.0)        # (B, A, K); clip pads back to 0

    # Gather the best-matching detection's class row and prob_max.
    best_cls = jnp.take_along_axis(det_scores_cls, best[..., None], axis=2)  # (B, A, K, C)
    best_pm = jnp.take_along_axis(det_prob_max, best, axis=2)   # (B, A, K)

    ref_cls = jnp.broadcast_to(ref_scores_cls[:, None], best_cls.shape)
    js = js_divergence(ref_cls, best_cls)                  # (B, A, K)

    pm_ref = ref_prob_max[:, None, :]                      # (B, 1, K)
    value = jnp.abs(max_iou + 0.5 * (1.0 - js) * (pm_ref + best_pm) - base_point)

    # min over valid reference boxes, seeded at 1.0 like the reference loop.
    value = jnp.where(ref_valid[:, None, :], value, jnp.inf)
    per_aug = jnp.minimum(1.0, jnp.min(value, axis=-1))    # (B, A)

    # An augmented image with zero detections contributes 0.0.
    any_det = jnp.any(det_valid, axis=-1)                  # (B, A)
    per_aug = jnp.where(any_det, per_aug, 0.0)

    consistency = jnp.mean(per_aug, axis=-1)               # (B,)

    # Images whose base forward produced no detections score 0.0.
    ref_any = jnp.any(ref_valid, axis=-1)
    return jnp.where(ref_any, consistency, 0.0)


def class_correlation(scores: jnp.ndarray, labels: jnp.ndarray, valid: jnp.ndarray,
                      num_fg_classes: int) -> jnp.ndarray:
    """Per-class max detection score (the reference's ``cls_corr``,
    /root/reference/cald_train.py:114-117): for each foreground class c (1-based
    label c+1) the maximum score over detections with that label, else 0.

    scores/labels/valid: (..., K); returns (..., num_fg_classes).
    """
    onehot = jax.nn.one_hot(labels - 1, num_fg_classes, dtype=scores.dtype)
    s = jnp.where(valid, scores, 0.0)
    return jnp.max(onehot * s[..., None], axis=-2)
