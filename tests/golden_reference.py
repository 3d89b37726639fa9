"""Golden reference: a literal transcription of the torchvision/reference
Faster R-CNN EVAL path (RPN head -> filter_proposals -> MultiScaleRoIAlign ->
box head -> the reference's custom postprocess_detections), operating on
dynamic per-image numpy arrays exactly like the reference does.

This is the ground-truth generator for the detector golden-parity test: it
consumes the SAME Flax parameters and the SAME FPN pyramid as the cald_tpu
detect path, so any divergence isolates a detection-logic (ordering /
convention / formula) mismatch rather than a conv-numerics difference.

Transcribed from (all in /root/reference/detection/):
  frcnn_la.py:32-87    custom postprocess_detections with the CALD extras
  frcnn_ll.py:283-322  vendored torchvision filter_proposals
  frcnn_la.py:186-190  AnchorGenerator schedule
  torchvision BoxCoder encode/decode with the log(1000/16) clamp

Dense tensor math (convs / linears) uses torch-cpu; detection logic is plain
numpy with Python loops — intentionally the reference's shape-dynamic style,
NOT a performance implementation.
"""

from __future__ import annotations

import math

import numpy as np
import torch
import torch.nn.functional as F

BBOX_XFORM_CLIP = math.log(1000.0 / 16.0)


# ---------------------------------------------------------------------------
# primitive transcriptions
# ---------------------------------------------------------------------------

def np_decode_boxes(deltas: np.ndarray, boxes: np.ndarray,
                    weights=(1.0, 1.0, 1.0, 1.0)) -> np.ndarray:
    """torchvision BoxCoder.decode_single. deltas (..., 4), boxes (..., 4)."""
    wx, wy, ww, wh = weights
    widths = boxes[..., 2] - boxes[..., 0]
    heights = boxes[..., 3] - boxes[..., 1]
    ctr_x = boxes[..., 0] + 0.5 * widths
    ctr_y = boxes[..., 1] + 0.5 * heights
    dx = deltas[..., 0] / wx
    dy = deltas[..., 1] / wy
    dw = np.minimum(deltas[..., 2] / ww, BBOX_XFORM_CLIP)
    dh = np.minimum(deltas[..., 3] / wh, BBOX_XFORM_CLIP)
    pred_ctr_x = dx * widths + ctr_x
    pred_ctr_y = dy * heights + ctr_y
    pred_w = np.exp(dw) * widths
    pred_h = np.exp(dh) * heights
    return np.stack([pred_ctr_x - 0.5 * pred_w, pred_ctr_y - 0.5 * pred_h,
                     pred_ctr_x + 0.5 * pred_w, pred_ctr_y + 0.5 * pred_h],
                    axis=-1)


def np_clip_boxes(boxes: np.ndarray, hw) -> np.ndarray:
    h, w = float(hw[0]), float(hw[1])
    out = boxes.copy()
    out[..., 0] = np.clip(boxes[..., 0], 0, w)
    out[..., 1] = np.clip(boxes[..., 1], 0, h)
    out[..., 2] = np.clip(boxes[..., 2], 0, w)
    out[..., 3] = np.clip(boxes[..., 3], 0, h)
    return out


def np_nms(boxes: np.ndarray, scores: np.ndarray, thresh: float) -> np.ndarray:
    """Serial greedy NMS, torchvision semantics (suppress on IoU > thresh).
    Returns kept indices in descending score order."""
    order = np.argsort(-scores, kind="stable")
    keep = []
    suppressed = np.zeros(len(boxes), bool)
    areas = (boxes[:, 2] - boxes[:, 0]) * (boxes[:, 3] - boxes[:, 1])
    for i in order:
        if suppressed[i]:
            continue
        keep.append(i)
        xx1 = np.maximum(boxes[i, 0], boxes[:, 0])
        yy1 = np.maximum(boxes[i, 1], boxes[:, 1])
        xx2 = np.minimum(boxes[i, 2], boxes[:, 2])
        yy2 = np.minimum(boxes[i, 3], boxes[:, 3])
        inter = np.clip(xx2 - xx1, 0, None) * np.clip(yy2 - yy1, 0, None)
        union = areas[i] + areas - inter
        iou = np.where(union > 0, inter / np.maximum(union, 1e-12), 0.0)
        suppressed |= iou > thresh
    return np.asarray(keep, np.int64)


def np_batched_nms(boxes, scores, idxs, thresh):
    """torchvision batched_nms (coordinate-offset trick)."""
    if len(boxes) == 0:
        return np.zeros((0,), np.int64)
    max_coord = boxes.max()
    offsets = idxs.astype(boxes.dtype) * (max_coord + 1.0)
    return np_nms(boxes + offsets[:, None], scores, thresh)


def tv_cell_anchors(sizes, aspect_ratios) -> np.ndarray:
    """torchvision AnchorGenerator.generate_anchors: h=s*sqrt(a), w=s/sqrt(a),
    rounded."""
    out = []
    for s in sizes:
        for a in aspect_ratios:
            h = s * math.sqrt(a)
            w = s / math.sqrt(a)
            out.append([-w / 2, -h / 2, w / 2, h / 2])
    return np.round(np.asarray(out, np.float32))


def tv_grid_anchors(feat_hw, stride, sizes, aspect_ratios) -> np.ndarray:
    cells = tv_cell_anchors(sizes, aspect_ratios)
    fh, fw = feat_hw
    sx = np.arange(fw, dtype=np.float32) * stride
    sy = np.arange(fh, dtype=np.float32) * stride
    gx, gy = np.meshgrid(sx, sy)
    shifts = np.stack([gx, gy, gx, gy], -1).reshape(-1, 1, 4)
    return (shifts + cells[None]).reshape(-1, 4)


def np_roi_align(feat_chw, rois, spatial_scale, out_size=7, sampling_ratio=2):
    """torchvision roi_align (aligned=False), serial transcription."""
    c, fh, fw = feat_chw.shape

    def bilinear(y, x):
        if y < -1.0 or y > fh or x < -1.0 or x > fw:
            return np.zeros((c,), feat_chw.dtype)
        y = min(max(y, 0.0), fh - 1)
        x = min(max(x, 0.0), fw - 1)
        y0, x0 = int(np.floor(y)), int(np.floor(x))
        y1, x1 = min(y0 + 1, fh - 1), min(x0 + 1, fw - 1)
        ly, lx = y - y0, x - x0
        return ((1 - ly) * (1 - lx) * feat_chw[:, y0, x0]
                + (1 - ly) * lx * feat_chw[:, y0, x1]
                + ly * (1 - lx) * feat_chw[:, y1, x0]
                + ly * lx * feat_chw[:, y1, x1])

    out = np.zeros((len(rois), c, out_size, out_size), feat_chw.dtype)
    for r, roi in enumerate(rois):
        x1, y1, x2, y2 = [v * spatial_scale for v in roi]
        rw = max(x2 - x1, 1.0)
        rh = max(y2 - y1, 1.0)
        bin_h, bin_w = rh / out_size, rw / out_size
        gy = sampling_ratio if sampling_ratio > 0 else int(np.ceil(rh / out_size))
        gx = sampling_ratio if sampling_ratio > 0 else int(np.ceil(rw / out_size))
        for py in range(out_size):
            for px in range(out_size):
                acc = np.zeros((c,), np.float64)
                for iy in range(gy):
                    yy = y1 + py * bin_h + (iy + 0.5) * bin_h / gy
                    for ix in range(gx):
                        xx = x1 + px * bin_w + (ix + 0.5) * bin_w / gx
                        acc += bilinear(yy, xx)
                out[r, :, py, px] = acc / (gy * gx)
    return out


def tv_multi_scale_roi_align(feats_chw, rois, scales, out_size=7,
                             sampling_ratio=2,
                             canonical_scale=224, canonical_level=4):
    """torchvision MultiScaleRoIAlign: LevelMapper + per-level roi_align."""
    k_min = -int(round(math.log2(scales[0])))
    k_max = -int(round(math.log2(scales[-1])))
    areas = np.maximum((rois[:, 2] - rois[:, 0]) * (rois[:, 3] - rois[:, 1]), 0)
    lvls = np.floor(canonical_level + np.log2(np.sqrt(areas) / canonical_scale
                                              + 1e-6))
    lvls = np.clip(lvls, k_min, k_max).astype(np.int64) - k_min
    c = feats_chw[0].shape[0]
    out = np.zeros((len(rois), c, out_size, out_size), np.float32)
    for li, (feat, scale) in enumerate(zip(feats_chw, scales)):
        sel = np.where(lvls == li)[0]
        if len(sel):
            out[sel] = np_roi_align(feat, rois[sel], scale, out_size,
                                    sampling_ratio)
    return out


# ---------------------------------------------------------------------------
# parameter adapters (flax HWIO / NHWC -> torch)
# ---------------------------------------------------------------------------

def _t(x):
    return torch.from_numpy(np.asarray(x, np.float32))


def conv2d(x_nchw, flax_conv, stride=1, padding=0):
    w = _t(flax_conv["kernel"]).permute(3, 2, 0, 1)  # HWIO -> OIHW
    b = _t(flax_conv["bias"]) if "bias" in flax_conv else None
    return F.conv2d(x_nchw, w, b, stride=stride, padding=padding)


def dense(x, flax_dense):
    return x @ _t(flax_dense["kernel"]) + _t(flax_dense["bias"])


# ---------------------------------------------------------------------------
# the reference eval chain (single image)
# ---------------------------------------------------------------------------

def rpn_head_forward(pyramid_nhwc, rpn_params):
    """Returns (objectness (N,), deltas (N, 4)) concatenated over levels in
    (y, x, anchor) order, plus per-level counts."""
    obj_all, reg_all, counts = [], [], []
    for f in pyramid_nhwc:
        x = torch.from_numpy(np.asarray(f, np.float32)).permute(0, 3, 1, 2)
        t = F.relu(conv2d(x, rpn_params["conv"], padding=1))
        o = conv2d(t, rpn_params["objectness"])    # (1, A, H, W)
        d = conv2d(t, rpn_params["deltas"])        # (1, A*4, H, W)
        a = o.shape[1]
        # flax layout: (H, W, A) row-major == permute NCHW -> NHWC
        obj = o.permute(0, 2, 3, 1).reshape(-1).numpy()
        dl = d.permute(0, 2, 3, 1).reshape(-1, 4).numpy()
        obj_all.append(obj)
        reg_all.append(dl)
        counts.append(obj.size)
    return (np.concatenate(obj_all), np.concatenate(reg_all, 0), counts)


def filter_proposals(proposals, objectness, counts, hw, *, pre_nms_top_n,
                     post_nms_top_n, nms_thresh=0.7, min_size=1e-3):
    """torchvision RPN.filter_proposals (frcnn_ll.py:283-322), single image.
    NOTE: raw logits order the candidates (no sigmoid — monotonic)."""
    sel_boxes, sel_scores, sel_lvls = [], [], []
    off = 0
    for lvl, n in enumerate(counts):
        k = min(pre_nms_top_n, n)
        obj_l = objectness[off:off + n]
        top = np.argsort(-obj_l, kind="stable")[:k]
        sel_boxes.append(proposals[off:off + n][top])
        sel_scores.append(obj_l[top])
        sel_lvls.append(np.full(k, lvl, np.int64))
        off += n
    boxes = np.concatenate(sel_boxes, 0)
    scores = np.concatenate(sel_scores)
    lvls = np.concatenate(sel_lvls)

    boxes = np_clip_boxes(boxes, hw)
    ws, hs = boxes[:, 2] - boxes[:, 0], boxes[:, 3] - boxes[:, 1]
    keep = (ws >= min_size) & (hs >= min_size) & (scores > -1e8)
    boxes, scores, lvls = boxes[keep], scores[keep], lvls[keep]
    keep = np_batched_nms(boxes, scores, lvls, nms_thresh)[:post_nms_top_n]
    return boxes[keep], scores[keep]


def ref_postprocess(class_logits, box_regression, proposals, hw, *,
                    score_thresh=0.05, nms_thresh=0.5, detections_per_img=100):
    """frcnn_la.py:32-87, single image. Returns dict of numpy arrays."""
    n, c = class_logits.shape
    scores = torch.softmax(torch.from_numpy(class_logits), -1).numpy()
    boxes = np_decode_boxes(box_regression.reshape(n, c, 4), proposals[:, None],
                            weights=(10.0, 10.0, 5.0, 5.0))
    boxes = np_clip_boxes(boxes, hw)

    scores_cls = np.repeat(scores, c - 1, axis=0)           # (N*(C-1), C)
    fg_boxes = boxes[:, 1:, :].reshape(-1, 4)
    fg_scores = scores[:, 1:].reshape(-1)
    labels = np.tile(np.arange(1, c), n)
    props = np.repeat(proposals, c - 1, axis=0)
    prob_max = np.repeat(scores[:, 1:].max(-1), c - 1)      # fg-only max

    inds = np.where(fg_scores > score_thresh)[0]
    fg_boxes, fg_scores, labels = fg_boxes[inds], fg_scores[inds], labels[inds]
    props, prob_max, scores_cls = props[inds], prob_max[inds], scores_cls[inds]

    keep = np_batched_nms(fg_boxes, fg_scores, labels, nms_thresh)
    keep = keep[:detections_per_img]
    return {
        "boxes": fg_boxes[keep], "scores": fg_scores[keep],
        "labels": labels[keep], "props": props[keep],
        "prob_max": prob_max[keep], "scores_cls": scores_cls[keep],
    }


def golden_detect(pyramid_nhwc, params, valid_hw, cfg):
    """Full reference eval chain for ONE image.

    pyramid_nhwc: list of (1, H, W, C) numpy FPN levels (model seam — shared
    with the Flax path). params: the FasterRCNN Flax param tree (numpy leaves).
    cfg: FasterRCNNConfig. Returns ref_postprocess output dict.
    """
    objectness, deltas, counts = rpn_head_forward(pyramid_nhwc,
                                                  params["rpn_head"])
    anchors = np.concatenate([
        tv_grid_anchors(f.shape[1:3], s, sz, cfg.aspect_ratios)
        for f, s, sz in zip(
            pyramid_nhwc, cfg.strides,
            cfg.anchor_sizes if len(cfg.anchor_sizes) == len(pyramid_nhwc)
            else [cfg.anchor_sizes[0]] * len(pyramid_nhwc))
    ], 0)
    # canvas-independence semantics (PARITY.md): anchors centered on canvas
    # padding are excluded from candidacy, matching rpn.select_proposals
    cx = (anchors[:, 0] + anchors[:, 2]) * 0.5
    cy = (anchors[:, 1] + anchors[:, 3]) * 0.5
    inside = (cx < float(valid_hw[1])) & (cy < float(valid_hw[0]))
    objectness = np.where(inside, objectness, -1e9)
    proposals_all = np_decode_boxes(deltas, anchors)
    props, _ = filter_proposals(
        proposals_all, objectness, counts, valid_hw,
        pre_nms_top_n=cfg.rpn_pre_nms_top_n_test,
        post_nms_top_n=cfg.rpn_post_nms_top_n_test,
        nms_thresh=cfg.rpn_nms_thresh)

    feats_chw = [np.asarray(f, np.float32)[0].transpose(2, 0, 1)
                 for f in pyramid_nhwc[: cfg.roi_levels]]
    scales = [1.0 / s for s in cfg.strides[: cfg.roi_levels]]
    pooled = tv_multi_scale_roi_align(feats_chw, props, scales)

    # flatten in the Flax (H, W, C) layout so fc6's kernel rows line up —
    # torchvision flattens CHW, but the box-head weights under test are Flax's.
    x = torch.from_numpy(
        np.ascontiguousarray(pooled.transpose(0, 2, 3, 1)).reshape(
            len(props), -1))
    x = F.relu(dense(x, params["box_head"]["fc6"]))
    x = F.relu(dense(x, params["box_head"]["fc7"]))
    class_logits = dense(x, params["box_predictor"]["cls_score"]).numpy()
    box_regression = dense(x, params["box_predictor"]["bbox_pred"]).numpy()

    return ref_postprocess(class_logits, box_regression, props, valid_hw,
                           score_thresh=cfg.box_score_thresh,
                           nms_thresh=cfg.box_nms_thresh,
                           detections_per_img=cfg.detections_per_img)
