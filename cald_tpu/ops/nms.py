"""Fixed-shape non-maximum suppression for TPU.

The torchvision C++/CUDA ``nms`` / ``batched_nms`` ops
(/root/reference/detection/frcnn_la.py:76, retinanet_cal.py:460) are replaced by a
static-shape formulation compatible with ``jit``:

  1. sort candidates by score (descending; padded/invalid entries get -inf),
  2. build the pairwise IoU matrix of the top ``pre_nms_size`` candidates,
  3. run the classic triangular suppression recurrence with ``lax.fori_loop``
     (a box is suppressed when a not-suppressed, higher-scoring box overlaps it
     with IoU strictly greater than the threshold — torchvision semantics),
  4. compact the surviving boxes into ``max_outputs`` slots with a cumsum scatter.

Outputs are index arrays plus validity masks; downstream code gathers with them.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from cald_tpu.ops.boxes import box_iou

NEG_INF = -1e30


def _suppression(iou: jnp.ndarray, alive0: jnp.ndarray, iou_threshold: float) -> jnp.ndarray:
    """Triangular suppression over a score-sorted IoU matrix.

    iou: (K, K) IoU of score-sorted candidates; alive0: (K,) initial validity.
    Returns the final alive mask (kept boxes).
    """
    k = iou.shape[0]
    idx = jnp.arange(k)

    def body(i, alive):
        row = jax.lax.dynamic_index_in_dim(iou, i, axis=0, keepdims=False)
        i_alive = jax.lax.dynamic_index_in_dim(alive, i, axis=0, keepdims=False)
        kill = (row > iou_threshold) & (idx > i) & i_alive
        return alive & ~kill

    return jax.lax.fori_loop(0, k, body, alive0)


@partial(jax.jit, static_argnames=("iou_threshold", "max_outputs", "pre_nms_size"))
def nms(boxes: jnp.ndarray, scores: jnp.ndarray, *, iou_threshold: float,
        max_outputs: int, valid: jnp.ndarray | None = None,
        pre_nms_size: int | None = None):
    """Single-class NMS.

    Args:
      boxes: (N, 4); scores: (N,); valid: optional (N,) bool mask.
      iou_threshold: suppress when IoU is strictly greater than this.
      max_outputs: number of output slots K.
      pre_nms_size: consider only the top-``pre_nms_size`` scored candidates
        (defaults to N; the IoU matrix is pre_nms_size**2).

    Returns:
      keep_idx: (K,) int32 indices into the input arrays (score-descending),
      keep_valid: (K,) bool — whether the slot holds a real detection.
    """
    n = boxes.shape[0]
    p = min(pre_nms_size or n, n)
    if valid is None:
        valid = jnp.ones((n,), dtype=bool)
    masked_scores = jnp.where(valid, scores, NEG_INF)
    order = jnp.argsort(-masked_scores)[:p]
    sboxes = boxes[order]
    salive = masked_scores[order] > NEG_INF / 2

    iou = box_iou(sboxes, sboxes)
    kept = _suppression(iou, salive, iou_threshold)

    # Compact kept entries (already score-sorted) into max_outputs slots.
    rank = jnp.cumsum(kept.astype(jnp.int32)) - 1
    write = kept & (rank < max_outputs)
    keep_idx = jnp.zeros((max_outputs,), jnp.int32)
    keep_valid = jnp.zeros((max_outputs,), bool)
    slot = jnp.where(write, rank, max_outputs)  # out-of-range drops the scatter
    keep_idx = keep_idx.at[slot].set(order.astype(jnp.int32), mode="drop")
    keep_valid = keep_valid.at[slot].set(True, mode="drop")
    return keep_idx, keep_valid


@partial(jax.jit, static_argnames=("iou_threshold", "max_outputs", "pre_nms_size"))
def batched_nms(boxes: jnp.ndarray, scores: jnp.ndarray, labels: jnp.ndarray, *,
                iou_threshold: float, max_outputs: int,
                valid: jnp.ndarray | None = None, pre_nms_size: int | None = None):
    """Class-aware NMS via the coordinate-offset trick (torchvision
    ``batched_nms``): boxes of different labels never overlap after each class is
    shifted into its own disjoint region of the plane."""
    if valid is None:
        valid = jnp.ones(boxes.shape[:1], dtype=bool)
    max_coord = jnp.max(jnp.where(valid[:, None], boxes, 0.0))
    offsets = labels.astype(boxes.dtype) * (max_coord + 1.0)
    shifted = boxes + offsets[:, None]
    return nms(shifted, scores, iou_threshold=iou_threshold, max_outputs=max_outputs,
               valid=valid, pre_nms_size=pre_nms_size)
