"""Detection loss kernels (jnp; trivially fused by XLA).

TPU-native replacements for torchvision's ``sigmoid_focal_loss``
(/root/reference/detection/retinanet_cal.py:127) and ``F.smooth_l1_loss`` /
``F.cross_entropy`` as used in the Faster R-CNN heads.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def sigmoid_focal_loss(logits: jnp.ndarray, targets: jnp.ndarray, *,
                       alpha: float = 0.25, gamma: float = 2.0) -> jnp.ndarray:
    """Per-element focal loss (no reduction), matching torchvision.

    targets are {0, 1} floats of the same shape as logits.
    """
    p = jax.nn.sigmoid(logits)
    ce = _bce_with_logits(logits, targets)
    p_t = p * targets + (1.0 - p) * (1.0 - targets)
    loss = ce * (1.0 - p_t) ** gamma
    if alpha >= 0:
        alpha_t = alpha * targets + (1.0 - alpha) * (1.0 - targets)
        loss = alpha_t * loss
    return loss


def _bce_with_logits(logits: jnp.ndarray, targets: jnp.ndarray) -> jnp.ndarray:
    """Numerically-stable binary cross entropy with logits (per element)."""
    return jnp.maximum(logits, 0.0) - logits * targets + jnp.log1p(jnp.exp(-jnp.abs(logits)))


bce_with_logits = _bce_with_logits


def smooth_l1_loss(pred: jnp.ndarray, target: jnp.ndarray, *,
                   beta: float = 1.0 / 9.0) -> jnp.ndarray:
    """Per-element smooth-L1 (Huber) with transition point ``beta``
    (torch ``F.smooth_l1_loss(..., beta=1/9)`` as used by fastrcnn_loss)."""
    diff = jnp.abs(pred - target)
    if beta <= 0.0:
        return diff
    return jnp.where(diff < beta, 0.5 * diff * diff / beta, diff - 0.5 * beta)


def softmax_cross_entropy(logits: jnp.ndarray, labels: jnp.ndarray) -> jnp.ndarray:
    """Per-example cross entropy against integer ``labels`` over the last axis."""
    logp = jax.nn.log_softmax(logits, axis=-1)
    return -jnp.take_along_axis(logp, labels[..., None].astype(jnp.int32), axis=-1)[..., 0]
