"""RetinaNet (the reference's retinanet_cal re-designed for TPU).

Mirrors /root/reference/detection/retinanet_cal.py:
  - ResNet-50-FPN on C3..C5 + LastLevelP6P7 (P2 skipped, :617-619),
  - 4-conv cls/reg subnets shared across levels, focal prior bias
    -log((1-pi)/pi), pi=0.01 (:88-90),
  - sigmoid focal loss (sum over valid anchors / num_foreground, meaned over
    images, :100-133) and L1 box loss over foreground (:186-221),
  - Matcher 0.5/0.4 with allow_low_quality (:358-363),
  - eval emits ``scores_cls`` (the detection's full sigmoid row) and
    ``prob_max`` (:437-488).

Deliberate deviation (documented): the reference postprocess decodes ALL anchors
and runs per-class NMS with a 300-per-class cap and no global cap (:402-488,
inherited from torchvision 0.8). Here each level contributes its top-1000
candidates, one class-aware NMS runs over the union, and the top
``detections_per_img`` (300) survive globally — torchvision's modern semantics
and a fixed-shape program; CALD scoring consumes at most ~50 detections per
image (cald_train.py:110-113) so selection behavior is unchanged.

Channel-0 deviation (documented): the reference's per-class postprocess loop
includes sigmoid channel 0 (retinanet_cal.py:437), a channel that one-hot
training (labels 1..20) drives toward zero for every anchor — it only emits
detections from untrained heads, and a label-0 "detection" would corrupt the
label-keyed evaluators. The TPU path masks label 0 out of the candidate set
(``cand &= labels > 0``); tests/test_golden_retina.py pins parity on the
remaining classes.

SSM variant deviation (documented): retina_ssm.py:540-545 randomly subsamples
each class's above-threshold candidates to 500 before NMS — a CUDA-memory
workaround (full VOC-size score matrices blew up the per-class python NMS
loop), not a semantic feature: it can only randomly DROP strong candidates that
NMS would otherwise keep. The fixed-shape TPU path scores every candidate
inside the same top-1000-per-level envelope (>= the reference's effective
coverage: 5 levels x 1000 >= 500 per class in practice), so the subsample is
intentionally not replicated; the SSM driver only switches NMS to 0.3.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from cald_tpu.data.transforms import IMAGENET_MEAN, IMAGENET_STD
from cald_tpu.models.anchors import (
    ASPECT_RATIOS, MOBILE_RETINA_SIZES, RETINA_SIZES, generate_anchors,
)
from cald_tpu.models.detections import Detections
from cald_tpu.models.fpn import FPN
from cald_tpu.models.layers import head_normal
from cald_tpu.models.matcher import BETWEEN, match_anchors
from cald_tpu.models.mobilenetv3 import MobileNetV3Backbone
from cald_tpu.models.resnet import ResNetBackbone
from cald_tpu.ops.boxes import clip_boxes, decode_boxes, encode_boxes
from cald_tpu.ops.losses import sigmoid_focal_loss
from cald_tpu.ops.nms import batched_nms


@dataclasses.dataclass(frozen=True)
class RetinaNetConfig:
    num_classes: int = 21               # channel space includes background idx 0
    backbone: str = "resnet50"          # resnet50 | mobilenet | tiny
    norm: str = "frozen"
    compute_dtype: str = "bfloat16"     # see FasterRCNNConfig.compute_dtype
    fpn_channels: int = 256
    anchor_sizes: tuple = RETINA_SIZES
    aspect_ratios: tuple = ASPECT_RATIOS
    fg_iou: float = 0.5
    bg_iou: float = 0.4
    prior_probability: float = 0.01
    focal_alpha: float = 0.25
    focal_gamma: float = 2.0
    score_thresh: float = 0.05
    nms_thresh: float = 0.5
    detections_per_img: int = 300
    topk_candidates: int = 1000

    @property
    def strides(self) -> tuple[int, ...]:
        if self.backbone == "mobilenet":
            return (32,)
        return (8, 16, 32, 64, 128)      # P3..P7


class RetinaNetHead(nn.Module):
    """Shared 4-conv classification + regression subnets
    (retinanet_cal.py:36-98,154-180)."""

    num_classes: int
    num_anchors: int
    channels: int = 256
    prior_probability: float = 0.01
    dtype: object = None

    @nn.compact
    def __call__(self, pyramid: Sequence[jnp.ndarray]):
        bias_init = nn.initializers.constant(
            -math.log((1.0 - self.prior_probability) / self.prior_probability))
        cls_convs = [nn.Conv(self.channels, (3, 3), padding=[(1, 1), (1, 1)],
                             kernel_init=head_normal, dtype=self.dtype,
                             name=f"cls_conv{i}")
                     for i in range(4)]
        reg_convs = [nn.Conv(self.channels, (3, 3), padding=[(1, 1), (1, 1)],
                             kernel_init=head_normal, dtype=self.dtype,
                             name=f"reg_conv{i}")
                     for i in range(4)]
        cls_out = nn.Conv(self.num_anchors * self.num_classes, (3, 3),
                          padding=[(1, 1), (1, 1)], kernel_init=head_normal,
                          bias_init=bias_init, dtype=self.dtype, name="cls_logits")
        reg_out = nn.Conv(self.num_anchors * 4, (3, 3), padding=[(1, 1), (1, 1)],
                          kernel_init=head_normal, dtype=self.dtype, name="bbox_reg")

        logits, regs = [], []
        for f in pyramid:
            t = f
            for conv in cls_convs:
                t = nn.relu(conv(t))
            b = f.shape[0]
            logits.append(cls_out(t).reshape(b, -1, self.num_classes)
                          .astype(jnp.float32))
            t = f
            for conv in reg_convs:
                t = nn.relu(conv(t))
            regs.append(reg_out(t).reshape(b, -1, 4).astype(jnp.float32))
        return jnp.concatenate(logits, axis=1), jnp.concatenate(regs, axis=1)


def retinanet_losses(cls_logits, bbox_reg, anchors, gt_boxes, gt_labels, gt_valid,
                     *, num_classes: int, fg_iou: float, bg_iou: float,
                     alpha: float, gamma: float):
    """Per-image (cls_loss, reg_loss) — retinanet_cal.py:100-133,186-221."""
    matches = match_anchors(gt_boxes, gt_valid, anchors,
                            high=fg_iou, low=bg_iou, allow_low_quality=True)
    fg = matches >= 0
    num_fg = jnp.maximum(jnp.sum(fg), 1.0)
    valid = matches != BETWEEN

    m = jnp.clip(matches, 0, None)
    tgt_onehot = jax.nn.one_hot(jnp.where(fg, gt_labels[m], -1), num_classes,
                                dtype=cls_logits.dtype)
    focal = sigmoid_focal_loss(cls_logits, tgt_onehot, alpha=alpha, gamma=gamma)
    cls_loss = jnp.sum(jnp.sum(focal, -1) * valid) / num_fg

    reg_targets = encode_boxes(gt_boxes[m], anchors)
    l1 = jnp.sum(jnp.abs(bbox_reg - reg_targets), axis=-1)
    reg_loss = jnp.sum(l1 * fg) / num_fg
    return cls_loss, reg_loss


def retinanet_postprocess(cls_logits, bbox_reg, anchors, level_counts,
                          valid_hw, *, score_thresh: float, nms_thresh: float,
                          detections_per_img: int, topk_candidates: int,
                          min_size: float = 1e-2) -> Detections:
    """Single image. Candidates = per-level top-k (anchor, class) pairs above
    the score threshold -> class-aware NMS -> global top detections.

    Anchors centered on canvas padding (outside ``valid_hw``) are excluded
    from candidacy — see rpn.select_proposals (PARITY.md: canvas-independence).
    """
    num_classes = cls_logits.shape[-1]
    scores_all = jax.nn.sigmoid(cls_logits)                    # (N, C)
    cx = (anchors[:, 0] + anchors[:, 2]) * 0.5
    cy = (anchors[:, 1] + anchors[:, 3]) * 0.5
    inside = (cx < valid_hw[1].astype(cx.dtype)) & (cy < valid_hw[0].astype(cy.dtype))
    # zeroed rows can never pass the score_thresh candidate filter below;
    # kept detections therefore always index unmasked scores_all rows
    scores_all = scores_all * inside[:, None]

    cand_scores, cand_boxes, cand_labels, cand_anchor = [], [], [], []
    offset = 0
    for cnt in level_counts:
        k = min(topk_candidates, cnt * num_classes)
        sl = jax.lax.dynamic_slice_in_dim(scores_all, offset, cnt).reshape(-1)
        top_v, top_i = jax.lax.top_k(sl, k)
        a_idx = top_i // num_classes
        c_idx = top_i % num_classes
        reg = jax.lax.dynamic_slice_in_dim(bbox_reg, offset, cnt)[a_idx]
        anc = jax.lax.dynamic_slice_in_dim(anchors, offset, cnt)[a_idx]
        cand_scores.append(top_v)
        cand_boxes.append(decode_boxes(reg, anc))
        cand_labels.append(c_idx.astype(jnp.int32))
        cand_anchor.append(a_idx + offset)
        offset += cnt

    scores = jnp.concatenate(cand_scores)
    boxes = jnp.concatenate(cand_boxes, axis=0)
    labels = jnp.concatenate(cand_labels)
    anchor_idx = jnp.concatenate(cand_anchor)

    h = valid_hw[0].astype(boxes.dtype)
    w = valid_hw[1].astype(boxes.dtype)
    boxes = clip_boxes(boxes, (h, w))
    ws = boxes[:, 2] - boxes[:, 0]
    hs = boxes[:, 3] - boxes[:, 1]
    cand = (scores > score_thresh) & (ws >= min_size) & (hs >= min_size)
    # background channel 0 is never a detection (gt labels are 1-based)
    cand &= labels > 0

    keep_idx, keep_valid = batched_nms(
        boxes, scores, labels, iou_threshold=nms_thresh,
        max_outputs=detections_per_img, valid=cand,
        pre_nms_size=min(boxes.shape[0], 2048))

    mask = keep_valid
    kept_anchor = anchor_idx[keep_idx]
    rows = scores_all[kept_anchor]                              # (K, C)
    return Detections(
        boxes=boxes[keep_idx] * mask[:, None],
        scores=scores[keep_idx] * mask,
        labels=labels[keep_idx] * mask,
        valid=mask,
        scores_cls=rows * mask[:, None],
        prob_max=jnp.max(rows, axis=-1) * mask,
        props=jnp.zeros((keep_idx.shape[0], 4), boxes.dtype),
    )


def _build_backbone(cfg: RetinaNetConfig):
    dt = None if cfg.compute_dtype == "float32" else jnp.dtype(cfg.compute_dtype)
    if cfg.backbone == "resnet50":
        return ResNetBackbone(blocks_per_stage=(3, 4, 6, 3), width=64,
                              norm=cfg.norm, dtype=dt), ("c3", "c4", "c5")
    if cfg.backbone == "tiny":
        return ResNetBackbone(blocks_per_stage=(1, 1, 1, 1), width=16,
                              norm=cfg.norm, dtype=dt), ("c3", "c4", "c5")
    if cfg.backbone == "mobilenet":
        return MobileNetV3Backbone(returned=("c5",), norm=cfg.norm,
                                   dtype=dt), ("c5",)
    raise ValueError(f"unknown backbone {cfg.backbone!r}")


class RetinaNet(nn.Module):
    cfg: RetinaNetConfig

    def setup(self):
        cfg = self.cfg
        dt = None if cfg.compute_dtype == "float32" else jnp.dtype(cfg.compute_dtype)
        self.backbone, self._feat_keys = _build_backbone(cfg)
        if cfg.backbone == "mobilenet":
            # single 960 -> 256 1x1 conv feature (retinanet_cal.py:685-716)
            self.fpn = None
        else:
            self.fpn = FPN(out_channels=cfg.fpn_channels, extra="p6p7", dtype=dt)
        a_per_cell = len(cfg.anchor_sizes[0]) * len(cfg.aspect_ratios)
        self.head = RetinaNetHead(num_classes=cfg.num_classes,
                                  num_anchors=a_per_cell,
                                  channels=cfg.fpn_channels,
                                  prior_probability=cfg.prior_probability,
                                  dtype=dt)
        if cfg.backbone == "mobilenet":
            self.reduce = nn.Conv(cfg.fpn_channels, (1, 1), dtype=dt, name="reduce")

    def _features(self, images, valid_hw=None, *, allow_fused: bool = False):
        x = (images / 255.0 - jnp.asarray(IMAGENET_MEAN)) / jnp.asarray(IMAGENET_STD)
        if self.cfg.compute_dtype != "float32":
            x = x.astype(jnp.dtype(self.cfg.compute_dtype))
        if valid_hw is not None:
            # zero canvas padding in normalized space — reference semantics
            # (normalize, then zero-pad the batch); see faster_rcnn._features
            from cald_tpu.models.faster_rcnn import _valid_mask

            x = x * _valid_mask(images.shape[1], images.shape[2], valid_hw, x.dtype)
        from cald_tpu.models.resnet import ResNetBackbone

        if isinstance(self.backbone, ResNetBackbone):
            feats = self.backbone(x, allow_fused=allow_fused)
        else:
            feats = self.backbone(x)
        maps = [feats[k] for k in self._feat_keys]
        if self.fpn is None:
            return [self.reduce(maps[-1])]
        return self.fpn(maps)

    def extract_features(self, images, valid_hw=None):
        """Pyramid only (LossNet input; reference retina_ll.py forward returns
        (features, outputs))."""
        return self._features(images, valid_hw)

    def _anchors(self, pyramid):
        cfg = self.cfg
        shapes = [(f.shape[1], f.shape[2]) for f in pyramid]
        sizes = cfg.anchor_sizes
        if len(sizes) != len(pyramid):
            sizes = tuple(sizes[0] for _ in pyramid)
        return generate_anchors(shapes, cfg.strides, sizes, cfg.aspect_ratios)

    def loss(self, images, valid_hw, gt_boxes, gt_labels, gt_valid, *,
             per_image: bool = False):
        """Returns ({'classification', 'bbox_regression'}, pyramid). Loss keys
        match the reference dict (retinanet_cal.py head.compute_loss)."""
        cfg = self.cfg
        pyramid = self._features(images, valid_hw)
        cls_logits, bbox_reg = self.head(pyramid)
        anchors, _ = self._anchors(pyramid)
        cls_loss, reg_loss = jax.vmap(
            lambda cl, br, gb, gl, gv: retinanet_losses(
                cl, br, anchors, gb, gl, gv, num_classes=cfg.num_classes,
                fg_iou=cfg.fg_iou, bg_iou=cfg.bg_iou,
                alpha=cfg.focal_alpha, gamma=cfg.focal_gamma)
        )(cls_logits, bbox_reg, gt_boxes, gt_labels, gt_valid)
        losses = {"classification": cls_loss, "bbox_regression": reg_loss}
        if not per_image:
            losses = {k: jnp.mean(v) for k, v in losses.items()}
        return losses, pyramid

    def detect(self, images, valid_hw) -> Detections:
        cfg = self.cfg
        pyramid = self._features(images, valid_hw)
        cls_logits, bbox_reg = self.head(pyramid)
        anchors, counts = self._anchors(pyramid)
        return jax.vmap(
            lambda cl, br, hw: retinanet_postprocess(
                cl, br, anchors, counts, hw, score_thresh=cfg.score_thresh,
                nms_thresh=cfg.nms_thresh,
                detections_per_img=cfg.detections_per_img,
                topk_candidates=cfg.topk_candidates)
        )(cls_logits, bbox_reg, valid_hw)

    def __call__(self, images, valid_hw):
        return self.detect(images, valid_hw)


def retinanet_resnet50_fpn_cal(num_classes: int = 21, **kw) -> RetinaNet:
    """Reference constructor (retinanet_cal.py:584)."""
    return RetinaNet(RetinaNetConfig(num_classes=num_classes, backbone="resnet50", **kw))


def retinanet_mobilenet(num_classes: int = 21, **kw) -> RetinaNet:
    """Single-level MobileNetV3-Large variant (retinanet_cal.py:628-665)."""
    kw.setdefault("anchor_sizes", MOBILE_RETINA_SIZES)
    return RetinaNet(RetinaNetConfig(num_classes=num_classes, backbone="mobilenet", **kw))
