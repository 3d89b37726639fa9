"""Faster R-CNN RoI heads, fixed-shape, with the CALD extras.

Re-designs /root/reference/detection/frcnn_la.py:32-144:
  - training: append gt to proposals, match 0.5/0.5 (no low-quality), sample
    512 @ 25% positives, CE cls loss + smooth-L1 (beta=1/9) box loss over the
    matched class's regression row, normalized by the sample count
    (frcnn_ll.py:29-64 shows the same math per image),
  - inference: softmax rows expand to (proposal, class) instances, score filter
    0.05, per-class NMS 0.5, top-100 — each kept detection carries ``props``
    (its source proposal), ``prob_max`` and the full softmax row ``scores_cls``
    (frcnn_la.py:32-87).
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from cald_tpu.models.detections import Detections
from cald_tpu.models.layers import head_normal
from cald_tpu.models.matcher import balanced_sample, match_anchors
from cald_tpu.ops.boxes import clip_boxes, decode_boxes, encode_boxes
from cald_tpu.ops.losses import smooth_l1_loss
from cald_tpu.ops.nms import batched_nms
from cald_tpu.ops.roi_align import multi_scale_roi_align

ROI_REG_WEIGHTS = (10.0, 10.0, 5.0, 5.0)


class TwoMLPHead(nn.Module):
    """flatten -> fc -> relu -> fc -> relu (frcnn_la.py:211-217)."""

    representation_size: int = 1024
    dtype: object = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        x = x.reshape(x.shape[0], -1)
        if self.dtype is not None:
            x = x.astype(self.dtype)
        x = nn.relu(nn.Dense(self.representation_size, dtype=self.dtype,
                             name="fc6")(x))
        x = nn.relu(nn.Dense(self.representation_size, dtype=self.dtype,
                             name="fc7")(x))
        return x


class FastRCNNPredictor(nn.Module):
    num_classes: int
    dtype: object = None

    @nn.compact
    def __call__(self, x: jnp.ndarray):
        cls = nn.Dense(self.num_classes, kernel_init=head_normal,
                       dtype=self.dtype, name="cls_score")(x)
        reg = nn.Dense(self.num_classes * 4, kernel_init=head_normal,
                       dtype=self.dtype, name="bbox_pred")(x)
        return cls.astype(jnp.float32), reg.astype(jnp.float32)


def select_training_samples(proposals: jnp.ndarray, prop_valid: jnp.ndarray,
                            gt_boxes: jnp.ndarray, gt_labels: jnp.ndarray,
                            gt_valid: jnp.ndarray, key: jax.Array, *,
                            batch_size_per_image: int = 512,
                            positive_fraction: float = 0.25,
                            fg_iou: float = 0.5, bg_iou: float = 0.5):
    """Single image: pick the fixed training proposal set.

    Returns (rois (S, 4), labels (S,), reg_targets (S, 4), is_pos (S,), valid (S,)).
    torchvision appends the gt boxes to the proposal list before matching
    (roi_heads.add_gt_proposals) — guaranteed positives early in training.
    """
    all_props = jnp.concatenate([proposals, gt_boxes], axis=0)
    all_valid = jnp.concatenate([prop_valid, gt_valid], axis=0)

    matches = match_anchors(gt_boxes, gt_valid, all_props,
                            high=fg_iou, low=bg_iou, allow_low_quality=False)
    # proposals that are padding slots can never be sampled: force BELOW and
    # exclude via the score mask trick (mark BETWEEN = unsampleable)
    matches = jnp.where(all_valid, matches, -2)

    idx, is_pos, valid = balanced_sample(
        matches, key, num_samples=batch_size_per_image,
        positive_fraction=positive_fraction)

    rois = all_props[idx]
    m = jnp.clip(matches[idx], 0, None)
    labels = jnp.where(is_pos, gt_labels[m], 0)
    reg_targets = encode_boxes(gt_boxes[m], rois, weights=ROI_REG_WEIGHTS)
    return rois, labels.astype(jnp.int32), reg_targets, is_pos, valid


def fastrcnn_loss(class_logits: jnp.ndarray, box_regression: jnp.ndarray,
                  labels: jnp.ndarray, reg_targets: jnp.ndarray,
                  is_pos: jnp.ndarray, valid: jnp.ndarray):
    """Per-image losses (frcnn_ll.py:29-64 math): CE mean over sampled, smooth-L1
    sum over positives / num_sampled. class_logits (S, C), box_regression (S, C*4).
    """
    s, c = class_logits.shape
    logp = jax.nn.log_softmax(class_logits, axis=-1)
    ce = -jnp.take_along_axis(logp, labels[:, None], axis=-1)[:, 0]
    n_sampled = jnp.maximum(jnp.sum(valid), 1.0)
    cls_loss = jnp.sum(ce * valid) / n_sampled

    br = box_regression.reshape(s, c, 4)
    picked = jnp.take_along_axis(br, labels[:, None, None].repeat(4, -1), axis=1)[:, 0]
    l1 = jnp.sum(smooth_l1_loss(picked, reg_targets, beta=1.0 / 9.0), axis=-1)
    box_loss = jnp.sum(l1 * (is_pos & valid)) / n_sampled
    return cls_loss, box_loss


def postprocess_detections(class_logits: jnp.ndarray, box_regression: jnp.ndarray,
                           proposals: jnp.ndarray, prop_valid: jnp.ndarray,
                           valid_hw: jnp.ndarray, *, score_thresh: float = 0.05,
                           nms_thresh: float = 0.5, detections_per_img: int = 100,
                           min_size: float = 0.0,
                           nms_pre_size: int = 2048) -> Detections:
    """Single image. class_logits (N, C), box_regression (N, C*4),
    proposals (N, 4). Returns fixed-slot Detections with CALD extras.

    Semantics transcribed from the reference's custom postprocess
    (frcnn_la.py:32-87): score filter > 0.05, per-class NMS 0.5, global top-100;
    ``prob_max`` is the max over FOREGROUND classes only (frcnn_la.py:59-64
    takes the max after dropping the background column) and there is NO
    small-box filter (the reference dropped torchvision's remove_small_boxes
    here), hence min_size=0.
    """
    n, c = class_logits.shape
    scores = jax.nn.softmax(class_logits, axis=-1)            # (N, C) full rows
    boxes = decode_boxes(box_regression.reshape(n, c, 4), proposals,
                         weights=ROI_REG_WEIGHTS)              # (N, C, 4)
    h = valid_hw[0].astype(boxes.dtype)
    w = valid_hw[1].astype(boxes.dtype)
    boxes = clip_boxes(boxes, (h, w))

    # flatten foreground (class >= 1) instances: (N*(C-1),)
    fg_scores = scores[:, 1:].reshape(-1)
    fg_boxes = boxes[:, 1:, :].reshape(-1, 4)
    fg_labels = jnp.tile(jnp.arange(1, c, dtype=jnp.int32)[None], (n, 1)).reshape(-1)
    prop_idx = jnp.repeat(jnp.arange(n, dtype=jnp.int32), c - 1)

    cand = fg_scores > score_thresh
    if min_size > 0.0:
        ws = fg_boxes[:, 2] - fg_boxes[:, 0]
        hs = fg_boxes[:, 3] - fg_boxes[:, 1]
        cand &= (ws >= min_size) & (hs >= min_size)
    cand &= jnp.repeat(prop_valid, c - 1)

    keep_idx, keep_valid = batched_nms(
        fg_boxes, fg_scores, fg_labels, iou_threshold=nms_thresh,
        max_outputs=detections_per_img, valid=cand,
        pre_nms_size=min(fg_boxes.shape[0], nms_pre_size))

    pidx = prop_idx[keep_idx]
    mask = keep_valid
    return Detections(
        boxes=fg_boxes[keep_idx] * mask[:, None],
        scores=fg_scores[keep_idx] * mask,
        labels=fg_labels[keep_idx] * mask,
        valid=mask,
        scores_cls=scores[pidx] * mask[:, None],
        prob_max=jnp.max(scores[pidx, 1:], axis=-1) * mask,
        props=proposals[pidx] * mask[:, None],
    )


def ssm_postprocess_detections(class_logits: jnp.ndarray,
                               box_regression: jnp.ndarray,
                               proposals: jnp.ndarray, prop_valid: jnp.ndarray,
                               valid_hw: jnp.ndarray, *,
                               score_thresh: float = 0.05,
                               nms_thresh: float = 0.3,
                               detections_per_class: int = 100,
                               out_slots: int = 300,
                               nms_pre_size: int = 4096) -> Detections:
    """The SSM variant postprocess (frcnn_ssm.py:44-88), fixed-shape.

    Differs from the standard path in exactly the reference's ways:
      * NO score filter before NMS (every foreground (proposal, class)
        instance competes; frcnn_ssm.py has no pre-filter),
      * per-class NMS at 0.3,
      * the top ``detections_per_class`` survivors PER CLASS (not a global
        top-k; frcnn_ssm.py:88 ``keep[:detections_per_img]`` inside the class
        loop),
      * the ``score > score_thresh`` filter applied AFTER NMS.
    Full softmax rows ride along as ``scores_cls`` for judge_y/judge_uv.

    Output-equivalent optimization: candidates with score <= score_thresh ARE
    masked before NMS even though the reference has no pre-filter. Greedy NMS
    suppression only flows from higher- to lower-scored boxes, so removing a
    sub-threshold candidate can never change which above-threshold boxes
    survive; sub-threshold survivors are removed by the post-filter anyway and
    (being score-sorted below every above-threshold same-class survivor)
    never displace one from a ``detections_per_class`` rank slot. The
    post-filtered output is therefore bit-identical to NMS-ing everything
    (pinned by TestSSMPostprocess against the no-pre-filter transcription).

    ``out_slots`` / ``nms_pre_size`` are the fixed-shape envelopes for the
    cross-class union and the NMS input (top-scoring-first in both): with the
    equivalence mask above, truncation can only drop above-threshold
    candidates once an image carries >nms_pre_size of them (>4096 softmax
    entries over 0.05 — more than 4 per proposal on average at the full 1000
    proposals), where the reference, with no fixed shapes, would NMS them all.
    """
    n, c = class_logits.shape
    scores = jax.nn.softmax(class_logits, axis=-1)
    boxes = decode_boxes(box_regression.reshape(n, c, 4), proposals,
                         weights=ROI_REG_WEIGHTS)
    h = valid_hw[0].astype(boxes.dtype)
    w = valid_hw[1].astype(boxes.dtype)
    boxes = clip_boxes(boxes, (h, w))

    fg_scores = scores[:, 1:].reshape(-1)
    fg_boxes = boxes[:, 1:, :].reshape(-1, 4)
    fg_labels = jnp.tile(jnp.arange(1, c, dtype=jnp.int32)[None], (n, 1)).reshape(-1)
    prop_idx = jnp.repeat(jnp.arange(n, dtype=jnp.int32), c - 1)
    # the score mask is output-equivalent (docstring) and keeps the
    # nms_pre_size envelope spent on candidates that can actually surface
    cand = jnp.repeat(prop_valid, c - 1) & (fg_scores > score_thresh)

    keep_idx, keep_valid = batched_nms(
        fg_boxes, fg_scores, fg_labels, iou_threshold=nms_thresh,
        max_outputs=out_slots, valid=cand,
        pre_nms_size=min(fg_boxes.shape[0], nms_pre_size))

    # survivors arrive score-descending, so rank-within-class = count of
    # earlier same-class survivors (a one-hot prefix sum)
    klabels = fg_labels[keep_idx]
    kscores = fg_scores[keep_idx]
    onehot = (jax.nn.one_hot(klabels, c, dtype=jnp.int32)
              * keep_valid[:, None].astype(jnp.int32))
    rank = jnp.take_along_axis(jnp.cumsum(onehot, axis=0) - onehot,
                               klabels[:, None], axis=1)[:, 0]
    mask = keep_valid & (rank < detections_per_class) & (kscores > score_thresh)

    pidx = prop_idx[keep_idx]
    return Detections(
        boxes=fg_boxes[keep_idx] * mask[:, None],
        scores=kscores * mask,
        labels=klabels * mask,
        valid=mask,
        scores_cls=scores[pidx] * mask[:, None],
        prob_max=jnp.max(scores[pidx, 1:], axis=-1) * mask,
        props=proposals[pidx] * mask[:, None],
    )


def pool_box_features(feats: Sequence[jnp.ndarray], rois: jnp.ndarray,
                      spatial_scales: Sequence[float], *, output_size: int = 7,
                      sampling_ratio: int = 2,
                      inference: bool = False) -> jnp.ndarray:
    """MultiScaleRoIAlign over FPN levels '0'-'3' (frcnn_la.py:206-209).

    On TPU backends the Pallas window-DMA kernel runs for BOTH inference and
    training (3.7x faster than XLA gathers forward, PERF.md; identical samples
    for rois within the window envelope; backward is the custom_vjp
    scatter-windows kernel, gradient-parity-tested against the pointwise
    path). ``inference`` selects the window envelope: the scoring path uses
    the measured-faster 44x48 window (aspect tail clamps, score-parity
    verified), training the 48x56 one so elongated-roi GRADIENTS stay exact
    (ADVICE r2). CPU uses the exact, differentiable pointwise path. Opt out
    with CALD_TPU_NO_PALLAS_ROI=1.
    """
    import os

    if (jax.default_backend() in ("tpu", "axon")
            and feats[0].shape[-1] % 128 == 0   # Mosaic lane-aligned reshape
            and os.environ.get("CALD_TPU_NO_PALLAS_ROI") != "1"):
        from cald_tpu.ops.pallas_roi_align import (
            WIN_INFER, WIN_TRAIN, pallas_multi_scale_roi_align,
        )

        return pallas_multi_scale_roi_align(
            list(feats), rois, spatial_scales=list(spatial_scales),
            output_size=output_size, sampling_ratio=sampling_ratio,
            window=WIN_INFER if inference else WIN_TRAIN)
    return multi_scale_roi_align(list(feats), rois, spatial_scales=list(spatial_scales),
                                 output_size=output_size, sampling_ratio=sampling_ratio)
