"""Geometry and detection kernels (pure jnp + Pallas where profitable).

Everything here is fixed-shape and jit-friendly: variable-count box sets are
represented as padded arrays plus validity masks.
"""

from cald_tpu.ops.boxes import (
    area,
    box_iou,
    clip_boxes,
    decode_boxes,
    encode_boxes,
    intersect,
    iou_one_vs_many,
    pairwise_iou_nocheck,
    remove_small_boxes_mask,
)
from cald_tpu.ops.nms import batched_nms, nms
from cald_tpu.ops.divergence import js_divergence, kl_divergence
from cald_tpu.ops.losses import sigmoid_focal_loss, smooth_l1_loss, softmax_cross_entropy
from cald_tpu.ops.roi_align import multi_scale_roi_align, roi_align
from cald_tpu.ops.consistency import cald_consistency

__all__ = [
    "area",
    "box_iou",
    "clip_boxes",
    "decode_boxes",
    "encode_boxes",
    "intersect",
    "iou_one_vs_many",
    "pairwise_iou_nocheck",
    "remove_small_boxes_mask",
    "nms",
    "batched_nms",
    "js_divergence",
    "kl_divergence",
    "sigmoid_focal_loss",
    "smooth_l1_loss",
    "softmax_cross_entropy",
    "roi_align",
    "multi_scale_roi_align",
    "cald_consistency",
]
