"""Region Proposal Network, fixed-shape (torchvision semantics).

Replaces the reference RPN (/root/reference/detection/frcnn_la.py:261 via
torchvision, per-image unreduced variant at frcnn_ll.py:243-318) with:
  - a shared 3x3 conv head over all pyramid levels,
  - per-level static top-k pre-NMS selection (2000 train / 1000 test per level,
    frcnn_la.py:154-156),
  - decode + clip + min-size masking, then level-aware batched NMS into exactly
    ``post_nms_top_n`` proposal slots per image (the reference zero-pads to the
    same count for LL4AL, frcnn_ll.py:316-318 — here it is the only mode),
  - loss with 256 sampled anchors @ 50% positives, BCE objectness + smooth-L1
    (beta=1/9) box regression normalized by the sample count.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from cald_tpu.models.layers import head_normal
from cald_tpu.models.matcher import BELOW, BETWEEN, balanced_sample, match_anchors
from cald_tpu.ops.boxes import clip_boxes, decode_boxes, encode_boxes
from cald_tpu.ops.losses import bce_with_logits, smooth_l1_loss
from cald_tpu.ops.nms import batched_nms


class RPNHead(nn.Module):
    """3x3 conv + sibling 1x1 objectness / 4A deltas convs, shared across levels.

    Conv compute runs in ``dtype`` (bf16 on TPU); outputs are cast to f32 —
    they feed box decoding and NMS, which need full precision."""

    num_anchors: int
    channels: int = 256
    dtype: object = None

    @nn.compact
    def __call__(self, feats: Sequence[jnp.ndarray]):
        conv = nn.Conv(self.channels, (3, 3), padding=[(1, 1), (1, 1)],
                       kernel_init=head_normal, dtype=self.dtype, name="conv")
        cls = nn.Conv(self.num_anchors, (1, 1), kernel_init=head_normal,
                      dtype=self.dtype, name="objectness")
        reg = nn.Conv(self.num_anchors * 4, (1, 1), kernel_init=head_normal,
                      dtype=self.dtype, name="deltas")
        obj_all, reg_all = [], []
        for f in feats:
            t = nn.relu(conv(f))
            b = f.shape[0]
            # (B, H, W, A) -> (B, H*W*A) matching anchor ordering (y, x, a)
            obj_all.append(cls(t).reshape(b, -1).astype(jnp.float32))
            reg_all.append(reg(t).reshape(b, -1, 4).astype(jnp.float32))
        return jnp.concatenate(obj_all, axis=1), jnp.concatenate(reg_all, axis=1)


def select_proposals(objectness: jnp.ndarray, deltas: jnp.ndarray,
                     anchors: jnp.ndarray, level_counts: Sequence[int],
                     valid_hw: jnp.ndarray, *, pre_nms_top_n: int,
                     post_nms_top_n: int, nms_thresh: float = 0.7,
                     min_size: float = 1e-3):
    """Single image. objectness (N,), deltas (N, 4), anchors (N, 4).

    Returns proposals (post_nms_top_n, 4), scores, valid mask.

    Anchors whose centers fall outside ``valid_hw`` (i.e. on canvas padding)
    are excluded from candidacy. The reference scores at batch 1 where the
    canvas is the image padded to a multiple of 32 — at most a 31-px ring of
    out-of-image anchors; on the fixed TPU canvases the padded region can be
    arbitrarily large, and excluding it makes detection independent of the
    canvas choice (PARITY.md: canvas-independence).
    """
    NEG = jnp.float32(-1e9)
    cx = (anchors[:, 0] + anchors[:, 2]) * 0.5
    cy = (anchors[:, 1] + anchors[:, 3]) * 0.5
    inside = (cx < valid_hw[1].astype(cx.dtype)) & (cy < valid_hw[0].astype(cy.dtype))
    objectness = jnp.where(inside, objectness, NEG)

    # per-level top-k (static k), torchvision _get_top_n_idx
    sel_obj, sel_boxes, sel_lvl = [], [], []
    offset = 0
    for lvl, cnt in enumerate(level_counts):
        k = min(pre_nms_top_n, cnt)
        obj_l = jax.lax.dynamic_slice_in_dim(objectness, offset, cnt)
        top_v, top_i = jax.lax.top_k(obj_l, k)
        d = jax.lax.dynamic_slice_in_dim(deltas, offset, cnt)[top_i]
        a = jax.lax.dynamic_slice_in_dim(anchors, offset, cnt)[top_i]
        boxes = decode_boxes(d, a)
        sel_obj.append(top_v)
        sel_boxes.append(boxes)
        sel_lvl.append(jnp.full((k,), lvl, jnp.int32))
        offset += cnt

    scores = jnp.concatenate(sel_obj)
    boxes = jnp.concatenate(sel_boxes, axis=0)
    lvls = jnp.concatenate(sel_lvl)

    h = valid_hw[0].astype(boxes.dtype)
    w = valid_hw[1].astype(boxes.dtype)
    boxes = clip_boxes(boxes, (h, w))
    ws = boxes[:, 2] - boxes[:, 0]
    hs = boxes[:, 3] - boxes[:, 1]
    keepable = (ws >= min_size) & (hs >= min_size) & (scores > NEG / 2)

    # torchvision applies sigmoid before NMS ordering; monotonic, but scores
    # returned downstream are sigmoid probabilities.
    probs = jax.nn.sigmoid(scores)
    keep_idx, keep_valid = batched_nms(
        boxes, probs, lvls, iou_threshold=nms_thresh,
        max_outputs=post_nms_top_n, valid=keepable,
        pre_nms_size=min(boxes.shape[0], 4096))
    out_boxes = boxes[keep_idx] * keep_valid[:, None]
    out_scores = probs[keep_idx] * keep_valid
    return out_boxes, out_scores, keep_valid


def rpn_loss(objectness: jnp.ndarray, deltas: jnp.ndarray, anchors: jnp.ndarray,
             gt_boxes: jnp.ndarray, gt_valid: jnp.ndarray, key: jax.Array, *,
             batch_size_per_image: int = 256, positive_fraction: float = 0.5,
             fg_iou: float = 0.7, bg_iou: float = 0.3):
    """Per-image RPN loss pair (objectness, box). Shapes as in select_proposals."""
    matches = match_anchors(gt_boxes, gt_valid, anchors,
                            high=fg_iou, low=bg_iou, allow_low_quality=True)
    idx, is_pos, valid = balanced_sample(
        matches, key, num_samples=batch_size_per_image,
        positive_fraction=positive_fraction)

    sampled_obj = objectness[idx]
    labels = is_pos.astype(objectness.dtype)
    bce = bce_with_logits(sampled_obj, labels)
    obj_loss = jnp.sum(bce * valid) / jnp.maximum(jnp.sum(valid), 1.0)

    matched_gt = gt_boxes[jnp.clip(matches[idx], 0, None)]
    targets = encode_boxes(matched_gt, anchors[idx])
    l1 = smooth_l1_loss(deltas[idx], targets, beta=1.0 / 9.0)
    box_loss = jnp.sum(jnp.sum(l1, -1) * (is_pos & valid)) / jnp.maximum(
        jnp.sum(valid), 1.0)
    return obj_loss, box_loss
