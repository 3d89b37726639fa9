"""Faster R-CNN, assembled (the reference's FRCNN_Feature re-designed for TPU).

Key differences from /root/reference/detection/frcnn_la.py (behavior preserved,
mechanics changed):
  - images arrive as fixed-canvas padded batches (resize happens in the data
    layer); normalization (frcnn_la.py:230-234) is fused into the first conv's
    program here,
  - train and eval paths are separate jitted methods (``loss`` / ``detect``)
    instead of a module-global training flag,
  - every per-image list in the reference becomes a vmapped fixed-shape lane:
    proposals are exactly ``post_nms_top_n`` slots, detections exactly
    ``detections_per_img`` slots with validity masks,
  - the eval path returns the CALD extras (props / prob_max / scores_cls,
    frcnn_la.py:126-142) in the ``Detections`` struct.

Loss path can optionally return PER-IMAGE loss vectors (the frcnn_ll.py:29-64
variant used by LL4AL) — same tensors, just not meaned over the batch.
"""

from __future__ import annotations

import dataclasses
from typing import Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from cald_tpu.data.transforms import IMAGENET_MEAN, IMAGENET_STD
from cald_tpu.models.anchors import ASPECT_RATIOS, FRCNN_SIZES, generate_anchors
from cald_tpu.models.detections import Detections
from cald_tpu.models.fpn import FPN
from cald_tpu.models.mobilenetv3 import MobileNetV3Backbone
from cald_tpu.models.resnet import ResNetBackbone
from cald_tpu.models.roi_heads import (
    FastRCNNPredictor,
    TwoMLPHead,
    fastrcnn_loss,
    pool_box_features,
    postprocess_detections,
    select_training_samples,
    ssm_postprocess_detections,
)
from cald_tpu.models.rpn import RPNHead, rpn_loss, select_proposals


@dataclasses.dataclass(frozen=True)
class FasterRCNNConfig:
    """Static architecture/inference configuration (reference defaults,
    frcnn_la.py:146-176)."""

    num_classes: int = 21
    backbone: str = "resnet50"          # resnet50 | mobilenetv3 | tiny
    norm: str = "frozen"
    # conv/matmul compute dtype; box decoding, NMS and scores stay f32.
    # bf16 is the TPU-native default (MXU-native, halves HBM traffic).
    compute_dtype: str = "bfloat16"
    fpn_channels: int = 256
    # RPN
    anchor_sizes: tuple = FRCNN_SIZES
    aspect_ratios: tuple = ASPECT_RATIOS
    rpn_pre_nms_top_n_train: int = 2000
    rpn_pre_nms_top_n_test: int = 1000
    rpn_post_nms_top_n_train: int = 2000
    rpn_post_nms_top_n_test: int = 1000
    rpn_nms_thresh: float = 0.7
    rpn_fg_iou: float = 0.7
    rpn_bg_iou: float = 0.3
    rpn_batch_size_per_image: int = 256
    rpn_positive_fraction: float = 0.5
    # Box head
    box_score_thresh: float = 0.05
    box_nms_thresh: float = 0.5
    detections_per_img: int = 100
    # SSM scoring variant: the frcnn_ssm.py:44-88 postprocess (no pre-NMS
    # score filter, per-class NMS + per-class top-k, post-NMS score filter)
    ssm_mode: bool = False
    ssm_out_slots: int = 300
    box_fg_iou: float = 0.5
    box_bg_iou: float = 0.5
    box_batch_size_per_image: int = 512
    box_positive_fraction: float = 0.25
    representation_size: int = 1024

    @property
    def strides(self) -> tuple[int, ...]:
        if self.backbone == "mobilenetv3":
            return (32, 32, 64)
        return (4, 8, 16, 32, 64)

    @property
    def roi_levels(self) -> int:
        """How many (finest-first) pyramid levels RoIAlign uses — all but the
        RPN-only extra level (frcnn_la.py:206-209 uses '0'-'3')."""
        return len(self.strides) - 1


def _build_backbone(cfg: FasterRCNNConfig):
    dt = _dtype(cfg.compute_dtype)
    if cfg.backbone == "resnet50":
        return ResNetBackbone(blocks_per_stage=(3, 4, 6, 3), width=64,
                              norm=cfg.norm, dtype=dt), ("c2", "c3", "c4", "c5")
    if cfg.backbone == "tiny":
        # CPU-testable miniature with the same interface
        return ResNetBackbone(blocks_per_stage=(1, 1, 1, 1), width=16,
                              norm=cfg.norm, dtype=dt), ("c2", "c3", "c4", "c5")
    if cfg.backbone == "mobilenetv3":
        return MobileNetV3Backbone(returned=("c4", "c5"), norm=cfg.norm,
                                   dtype=dt), ("c4", "c5")
    raise ValueError(f"unknown backbone {cfg.backbone!r}")


def _dtype(name: str):
    return None if name == "float32" else jnp.dtype(name)


def _valid_mask(h: int, w: int, valid_hw: jnp.ndarray, dtype) -> jnp.ndarray:
    """(B, H, W, 1) indicator of the valid (non-padding) canvas region."""
    rows = jnp.arange(h)[None, :] < valid_hw[:, 0:1]          # (B, H)
    cols = jnp.arange(w)[None, :] < valid_hw[:, 1:2]          # (B, W)
    return (rows[:, :, None] & cols[:, None, :]).astype(dtype)[..., None]


class FasterRCNN(nn.Module):
    cfg: FasterRCNNConfig

    def setup(self):
        cfg = self.cfg
        dt = _dtype(cfg.compute_dtype)
        self.backbone, self._feat_keys = _build_backbone(cfg)
        self.fpn = FPN(out_channels=cfg.fpn_channels, extra="pool", dtype=dt)
        a_per_cell = len(cfg.anchor_sizes[0]) * len(cfg.aspect_ratios)
        self.rpn_head = RPNHead(num_anchors=a_per_cell, channels=cfg.fpn_channels,
                                dtype=dt)
        self.box_head = TwoMLPHead(cfg.representation_size, dtype=dt)
        self.box_predictor = FastRCNNPredictor(cfg.num_classes, dtype=dt)

    def _features(self, images: jnp.ndarray, valid_hw=None, *,
                  allow_fused: bool = False) -> list[jnp.ndarray]:
        x = (images / 255.0 - jnp.asarray(IMAGENET_MEAN)) / jnp.asarray(IMAGENET_STD)
        dt = _dtype(self.cfg.compute_dtype)
        if dt is not None:
            x = x.astype(dt)
        if valid_hw is not None:
            # Zero the canvas padding in NORMALIZED space: the reference
            # normalizes each image first and zero-pads the batch after
            # (GeneralizedRCNNTransform, frcnn_la.py:230-234 + batch_images),
            # so padded pixels contribute 0 to convs there. Raw-zero padding
            # would instead contribute -mean/std.
            x = x * _valid_mask(images.shape[1], images.shape[2], valid_hw, x.dtype)
        # allow_fused: inference-only Pallas bottleneck stages (no vjp); the
        # training loss path and extract_features stay on the exact XLA path
        from cald_tpu.models.resnet import ResNetBackbone

        if isinstance(self.backbone, ResNetBackbone):
            feats = self.backbone(x, allow_fused=allow_fused)
        else:
            feats = self.backbone(x)
        return self.fpn([feats[k] for k in self._feat_keys])

    def extract_features(self, images: jnp.ndarray,
                         valid_hw=None) -> list[jnp.ndarray]:
        """FPN pyramid only (the reference forward returns ``features`` in every
        result dict, frcnn_la.py:126-142; used by LossNet scoring)."""
        return self._features(images, valid_hw)

    def _anchors(self, pyramid: Sequence[jnp.ndarray]):
        cfg = self.cfg
        shapes = [(f.shape[1], f.shape[2]) for f in pyramid]
        sizes = cfg.anchor_sizes
        if len(sizes) != len(pyramid):  # single-tuple schedule shared by levels
            sizes = tuple(sizes[0] for _ in pyramid)
        return generate_anchors(shapes, cfg.strides, sizes, cfg.aspect_ratios)

    def _proposals(self, pyramid, valid_hw, *, train: bool):
        cfg = self.cfg
        objectness, deltas = self.rpn_head(pyramid)
        anchors, counts = self._anchors(pyramid)
        pre = cfg.rpn_pre_nms_top_n_train if train else cfg.rpn_pre_nms_top_n_test
        post = cfg.rpn_post_nms_top_n_train if train else cfg.rpn_post_nms_top_n_test
        props, pscores, pvalid = jax.vmap(
            lambda o, d, hw: select_proposals(
                o, d, anchors, counts, hw, pre_nms_top_n=pre, post_nms_top_n=post,
                nms_thresh=cfg.rpn_nms_thresh)
        )(objectness, deltas, valid_hw)
        return objectness, deltas, anchors, props, pscores, pvalid

    def loss(self, images, valid_hw, gt_boxes, gt_labels, gt_valid, *,
             per_image: bool = False):
        """Training losses. Needs an 'sampling' RNG
        (apply(..., rngs={'sampling': key})).

        Returns dict(loss_objectness, loss_rpn_box_reg, loss_classifier,
        loss_box_reg) — scalars, or (B,) vectors when per_image=True (the
        LL4AL-style unreduced variant, frcnn_ll.py:29-64,243-276). Also returns
        the RoI-pooled pyramid features for LossNet consumers.
        """
        cfg = self.cfg
        pyramid = self._features(images, valid_hw)
        objectness, deltas, anchors, props, _, pvalid = self._proposals(
            pyramid, valid_hw, train=True)

        b = images.shape[0]
        key = self.make_rng("sampling")
        rpn_keys = jax.random.split(jax.random.fold_in(key, 0), b)
        roi_keys = jax.random.split(jax.random.fold_in(key, 1), b)

        obj_loss, rpn_box_loss = jax.vmap(
            lambda o, d, gb, gv, k: rpn_loss(
                o, d, anchors, gb, gv, k,
                batch_size_per_image=cfg.rpn_batch_size_per_image,
                positive_fraction=cfg.rpn_positive_fraction,
                fg_iou=cfg.rpn_fg_iou, bg_iou=cfg.rpn_bg_iou)
        )(objectness, deltas, gt_boxes, gt_valid, rpn_keys)

        # stop_gradient: proposals are treated as fixed inputs to the second
        # stage (torchvision detaches via the non-differentiable NMS path).
        props = jax.lax.stop_gradient(props)
        rois, labels, reg_targets, is_pos, valid = jax.vmap(
            lambda p, pv, gb, gl, gv, k: select_training_samples(
                p, pv, gb, gl, gv, k,
                batch_size_per_image=cfg.box_batch_size_per_image,
                positive_fraction=cfg.box_positive_fraction,
                fg_iou=cfg.box_fg_iou, bg_iou=cfg.box_bg_iou)
        )(props, pvalid, gt_boxes, gt_labels, gt_valid, roi_keys)

        scales = [1.0 / s for s in cfg.strides[: cfg.roi_levels]]
        box_feats = jax.vmap(
            lambda *fs_rois: pool_box_features(
                fs_rois[:-1], fs_rois[-1], scales)
        )(*pyramid[: cfg.roi_levels], rois)

        s = cfg.box_batch_size_per_image
        flat = box_feats.reshape(b * s, -1)
        rep = self.box_head(flat)
        class_logits, box_regression = self.box_predictor(rep)
        class_logits = class_logits.reshape(b, s, -1)
        box_regression = box_regression.reshape(b, s, -1)

        cls_loss, box_loss = jax.vmap(fastrcnn_loss)(
            class_logits, box_regression, labels, reg_targets, is_pos, valid)

        losses = {
            "loss_objectness": obj_loss,
            "loss_rpn_box_reg": rpn_box_loss,
            "loss_classifier": cls_loss,
            "loss_box_reg": box_loss,
        }
        if not per_image:
            losses = {k: jnp.mean(v) for k, v in losses.items()}
        return losses, pyramid

    def detect(self, images, valid_hw) -> Detections:
        """Inference: fixed-slot detections in resized-image coordinates, with
        CALD extras. Rescale to original coords with Detections.rescale."""
        cfg = self.cfg
        pyramid = self._features(images, valid_hw, allow_fused=True)
        _, _, _, props, _, pvalid = self._proposals(pyramid, valid_hw, train=False)

        b, n = props.shape[:2]
        scales = [1.0 / s for s in cfg.strides[: cfg.roi_levels]]
        import os

        # Default ON (round 5): the full-level-matmul RoI path is +59%
        # end-to-end on faithful scoring (PERF.md) and its selection
        # deviation sits ABOVE the aug-re-roll self-noise floor on 4/4
        # seeds (EXPERIMENTS.md round-5 gate). CALD_TPU_ROI_FLM=0 restores
        # the window-DMA kernel (bit-exact vs round-4 outputs).
        use_flm = (jax.default_backend() in ("tpu", "axon")
                   and pyramid[0].shape[-1] % 128 == 0
                   and os.environ.get("CALD_TPU_ROI_FLM", "1") == "1")
        if use_flm:
            # full-level-matmul RoI path: rois run in level-sorted slot
            # order, the head runs on all slots, and the small logits are
            # gathered back to proposal order (ops/flm_roi_align.py)
            from cald_tpu.ops.flm_roi_align import flm_multi_scale_roi_align

            pooled, slot = flm_multi_scale_roi_align(
                list(pyramid[: cfg.roi_levels]), props, pvalid,
                spatial_scales=scales)
            nslot = pooled.shape[1]
            rep = self.box_head(pooled.reshape(b * nslot, -1))
            class_logits, box_regression = self.box_predictor(rep)
            gather = lambda t: jnp.take_along_axis(
                t.reshape(b, nslot, -1), slot[:, :, None], axis=1)
            class_logits = gather(class_logits)
            box_regression = gather(box_regression)
        else:
            box_feats = jax.vmap(
                lambda *fs_rois: pool_box_features(
                    fs_rois[:-1], fs_rois[-1], scales, inference=True)
            )(*pyramid[: cfg.roi_levels], props)
            rep = self.box_head(box_feats.reshape(b * n, -1))
            class_logits, box_regression = self.box_predictor(rep)

        if cfg.ssm_mode:
            post = lambda cl, br, p, pv, hw: ssm_postprocess_detections(
                cl, br, p, pv, hw, score_thresh=cfg.box_score_thresh,
                nms_thresh=cfg.box_nms_thresh,
                detections_per_class=cfg.detections_per_img,
                out_slots=cfg.ssm_out_slots)
        else:
            post = lambda cl, br, p, pv, hw: postprocess_detections(
                cl, br, p, pv, hw, score_thresh=cfg.box_score_thresh,
                nms_thresh=cfg.box_nms_thresh,
                detections_per_img=cfg.detections_per_img)
        dets = jax.vmap(post)(
            class_logits.reshape(b, n, -1), box_regression.reshape(b, n, -1),
            props, pvalid, valid_hw)
        return dets

    def __call__(self, images, valid_hw):
        """Default apply == inference (keeps init simple)."""
        return self.detect(images, valid_hw)


def fasterrcnn_resnet50_fpn_feature(num_classes: int = 21, **kw) -> FasterRCNN:
    """Reference constructor name (frcnn_la.py:278)."""
    return FasterRCNN(FasterRCNNConfig(num_classes=num_classes, backbone="resnet50", **kw))


def fasterrcnn_mobilenetv3_fpn_feature(num_classes: int = 21, **kw) -> FasterRCNN:
    """MobileNetV3-Large-FPN variant (BASELINE.json configs[0]); anchor schedule
    ((32..512),) shared across the 3 levels like torchvision's
    fasterrcnn_mobilenet_v3_large_fpn."""
    kw.setdefault("anchor_sizes", ((32, 64, 128, 256, 512),))
    return FasterRCNN(FasterRCNNConfig(num_classes=num_classes, backbone="mobilenetv3", **kw))
