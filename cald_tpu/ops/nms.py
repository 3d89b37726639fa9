"""Fixed-shape non-maximum suppression for TPU (tiled, vectorized).

The torchvision C++/CUDA ``nms`` / ``batched_nms`` ops
(/root/reference/detection/frcnn_la.py:76, retinanet_cal.py:460) are replaced by
a static-shape formulation compatible with ``jit``. Greedy NMS is an inherently
sequential recurrence; a naive ``fori_loop`` over 4096 candidates costs 4096
tiny sequential steps and dominated the whole detector's latency. This module
uses the tiled scheme (in the spirit of TF's TPU NMS):

  1. sort candidates by score (descending; padded/invalid get -inf),
  2. process tiles of 128 boxes in score order — ~K/128 sequential steps:
       a. cross-tile: one (K, 128) IoU block kills tile members overlapped by
          any surviving higher-score box from FINALIZED tiles (vectorized),
       b. within-tile: fixpoint iteration of the greedy recurrence on the
          (128, 128) IoU block — converges to exactly the sequential result
          (each sweep finalizes at least one more decision level),
  3. compact survivors into ``max_outputs`` slots with a cumsum scatter.

Semantics match torchvision exactly: a box is suppressed when a surviving,
higher-scoring (earlier-sorted) box overlaps it with IoU strictly greater than
the threshold. Memory is O(K * tile) — no K x K matrix is ever materialized.

Outputs are index arrays plus validity masks; downstream code gathers with them.
"""

from __future__ import annotations

import os
from functools import partial

import jax
import jax.numpy as jnp

from cald_tpu.ops.boxes import box_iou

NEG_INF = -1e30
# Suppression tile (candidates per sequential step). Any value is EXACT —
# round-4 fused-program parity confirmed bit-identical proposals at 128/256/
# 512 (experiments/profile_rpn.py) — the tile only trades sequential step
# count against per-step IoU block size. Default 512: measured +3% on the
# full faithful scoring program at B=8 AND B=32 (28.3->29.2, 28.9->29.7
# img/s; PERF.md round 4) — fewer latency-bound sequential steps beat the
# larger per-step IoU blocks at every candidate count the detector uses.
TILE = int(os.environ.get("CALD_TPU_NMS_TILE", "512"))


def _self_suppression(iou: jnp.ndarray, alive0: jnp.ndarray,
                      iou_threshold: float) -> jnp.ndarray:
    """Greedy suppression within one score-sorted tile via fixpoint iteration.

    iou: (T, T); alive0: (T,). The greedy solution is the unique fixpoint of
      a_i = alive0_i  AND  no j < i with a_j and iou[j, i] > t
    reached from a = alive0 in at most T sweeps (typically 2-4).
    """
    t = iou.shape[0]
    upper = jnp.triu(jnp.ones((t, t), bool), k=1)   # j < i pairs (row kills col)
    overlap = (iou > iou_threshold) & upper

    def cond(state):
        a, prev, it = state
        return jnp.any(a != prev) & (it < t)

    def body(state):
        a, _, it = state
        kill = jnp.any(overlap & a[:, None], axis=0)
        return alive0 & ~kill, a, it + 1

    first = alive0 & ~jnp.any(overlap & alive0[:, None], axis=0)
    a, _, _ = jax.lax.while_loop(cond, body, (first, alive0, jnp.int32(0)))
    return a


def _tiled_suppression(sboxes: jnp.ndarray, alive0: jnp.ndarray,
                       iou_threshold: float, tile: int = TILE) -> jnp.ndarray:
    """Greedy NMS over score-sorted boxes (K, 4), K a multiple of ``tile``."""
    k = sboxes.shape[0]
    nt = k // tile
    pos = jnp.arange(k)

    def outer(i, alive):
        tile_boxes = jax.lax.dynamic_slice(sboxes, (i * tile, 0), (tile, 4))
        tile_alive = jax.lax.dynamic_slice(alive, (i * tile,), (tile,))
        # survivors of all finalized (earlier) tiles kill tile members
        cross = box_iou(sboxes, tile_boxes)                   # (K, T)
        prev_alive = alive & (pos < i * tile)
        killed = jnp.any((cross > iou_threshold) & prev_alive[:, None], axis=0)
        tile_alive = tile_alive & ~killed
        # then the within-tile greedy recurrence
        self_iou = box_iou(tile_boxes, tile_boxes)
        tile_alive = _self_suppression(self_iou, tile_alive, iou_threshold)
        return jax.lax.dynamic_update_slice(alive, tile_alive, (i * tile,))

    return jax.lax.fori_loop(0, nt, outer, alive0)


def _suppress(sboxes: jnp.ndarray, salive: jnp.ndarray,
              iou_threshold: float) -> jnp.ndarray:
    """The XLA tiled loop. (A Pallas in-VMEM suppression kernel existed as an
    opt-in through round 2 and was REMOVED: measured throughput-neutral
    end-to-end twice — NMS is a tiny slice of the scoring program — and the
    Mosaic kernel failed to compile under wide vmap batches on the v5e
    remote-compile path. Recoverable from git history if NMS ever dominates a
    profile.)"""
    return _tiled_suppression(sboxes, salive, iou_threshold)


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
        (defaults to N).

    Returns:
      keep_idx: (K,) int32 indices into the input arrays (score-descending),
      keep_valid: (K,) bool — whether the slot holds a real detection.
    """
    n = boxes.shape[0]
    p = min(pre_nms_size or n, n)
    p_pad = -(-p // TILE) * TILE
    if valid is None:
        valid = jnp.ones((n,), dtype=bool)
    masked_scores = jnp.where(valid, scores, NEG_INF)
    order = jnp.argsort(-masked_scores)[:p]
    sboxes = boxes[order]
    salive = masked_scores[order] > NEG_INF / 2
    if p_pad != p:  # pad to the tile size with dead slots
        sboxes = jnp.pad(sboxes, ((0, p_pad - p), (0, 0)))
        salive = jnp.pad(salive, (0, p_pad - p))

    kept = _suppress(sboxes, salive, iou_threshold)[:p]

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
