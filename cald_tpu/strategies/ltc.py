"""LT/C baseline: localization tightness (/root/reference/lt_c_train.py:90-121).

Per detection: IoU between the final box and the RPN proposal it came from
(``props``, the CALD extra), using the legacy +1 IoU (lt_c_train.py:90-101);
uncertainty = min over detections of |iou + prob_max - 1|, seeded at 1.0.
Ascending selection (least tight+confident first).
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np


def _legacy_iou(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Elementwise legacy IoU of box pairs (..., 4): +1 on intersection w/h and
    on one side of each area (exactly lt_c_train.py:90-101's conventions)."""
    width = jnp.minimum(a[..., 2], b[..., 2]) - jnp.maximum(a[..., 0], b[..., 0]) + 1.0
    height = jnp.minimum(a[..., 3], b[..., 3]) - jnp.maximum(a[..., 1], b[..., 1]) + 1.0
    a_area = (a[..., 2] - a[..., 0]) * (a[..., 3] - a[..., 1] + 1.0)
    b_area = (b[..., 2] - b[..., 0]) * (b[..., 3] - b[..., 1] + 1.0)
    inter = width * height
    iou = inter / (a_area + b_area - inter)
    return jnp.where((width <= 0) | (height <= 0), 0.0, iou)


def ltc_scores(dets) -> jnp.ndarray:
    """Batched uncertainty from a Detections struct: (B,)."""
    iou = _legacy_iou(dets.boxes, dets.props)
    u = jnp.abs(iou + dets.prob_max - 1.0)
    u = jnp.where(dets.valid, u, jnp.inf)
    return jnp.minimum(1.0, jnp.min(u, axis=-1))


def make_ltc_score_fn(model) -> Callable:
    def fn(variables, images, valid_hw):
        dets = model.apply(variables, images, valid_hw, method="detect")
        return ltc_scores(dets)

    return jax.jit(fn)


def run_ltc(score_fn: Callable, variables, loader, pool_indices) -> np.ndarray:
    pos = {int(idx): i for i, idx in enumerate(pool_indices)}
    out = np.full((len(pool_indices),), np.inf)
    for batch in loader:
        u = np.asarray(score_fn(variables, jnp.asarray(batch.images),
                                jnp.asarray(batch.valid_hw)))
        for i, idx in enumerate(batch.image_idx):
            out[pos[int(idx)]] = u[i]
    return out
