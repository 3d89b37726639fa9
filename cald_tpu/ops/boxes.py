"""Box geometry kernels.

Boxes are ``(..., 4)`` float arrays in ``(x1, y1, x2, y2)`` order. All kernels are
shape-polymorphic over leading batch dims, fully vectorized (no per-box Python
loops), and differentiable where that makes sense.

Reference behaviours mirrored (for score parity, not copied):
  - pairwise IoU as in torchvision ``box_ops.box_iou``.
  - the CALD scoring IoU variant that does NOT clamp the intersection but instead
    zeroes entries whose width or height is negative
    (see /root/reference/cald_train.py:203-210).
  - ``intersect`` all-pairs intersection areas used by the cutout rejection test
    (/root/reference/cald/cald_helper.py:226-243).
  - torchvision box encode/decode with per-coordinate weights and the
    ``log(1000/16)`` clamp on dw/dh.
"""

from __future__ import annotations

import math

import jax.numpy as jnp

# torchvision clamps decoded dw/dh at log(1000/16) to avoid exp overflow.
BBOX_XFORM_CLIP = math.log(1000.0 / 16.0)


def area(boxes: jnp.ndarray) -> jnp.ndarray:
    """Box areas, ``(..., N)`` for input ``(..., N, 4)``."""
    return (boxes[..., 2] - boxes[..., 0]) * (boxes[..., 3] - boxes[..., 1])


def intersect(boxes1: jnp.ndarray, boxes2: jnp.ndarray) -> jnp.ndarray:
    """All-pairs intersection areas, clamped at zero.

    boxes1: (..., N, 4), boxes2: (..., M, 4) -> (..., N, M).

    Width and height are computed as separate (..., N, M) arrays — never as a
    stacked (..., N, M, 2): a trailing dim of 2 forces XLA to pad the tile
    lanes 2 -> 128 (64x memory) when N, M are large (anchors/NMS candidates).
    """
    w = jnp.clip(jnp.minimum(boxes1[..., :, None, 2], boxes2[..., None, :, 2])
                 - jnp.maximum(boxes1[..., :, None, 0], boxes2[..., None, :, 0]), 0.0)
    h = jnp.clip(jnp.minimum(boxes1[..., :, None, 3], boxes2[..., None, :, 3])
                 - jnp.maximum(boxes1[..., :, None, 1], boxes2[..., None, :, 1]), 0.0)
    return w * h


def iou_one_vs_many(box: jnp.ndarray, boxes: jnp.ndarray) -> jnp.ndarray:
    """IoU of a single box (..., 4) against (..., M, 4) -> (..., M),
    torchvision (clamped) semantics. O(M) memory — the NMS inner loop."""
    b = box[..., None, :]
    w = jnp.clip(jnp.minimum(b[..., 2], boxes[..., 2])
                 - jnp.maximum(b[..., 0], boxes[..., 0]), 0.0)
    h = jnp.clip(jnp.minimum(b[..., 3], boxes[..., 3])
                 - jnp.maximum(b[..., 1], boxes[..., 1]), 0.0)
    inter = w * h
    union = area(b) + area(boxes) - inter
    return jnp.where(union > 0, inter / jnp.maximum(union, 1e-12), 0.0)


def box_iou(boxes1: jnp.ndarray, boxes2: jnp.ndarray) -> jnp.ndarray:
    """Pairwise IoU matrix (torchvision semantics): (..., N, M)."""
    inter = intersect(boxes1, boxes2)
    a1 = area(boxes1)[..., :, None]
    a2 = area(boxes2)[..., None, :]
    union = a1 + a2 - inter
    return jnp.where(union > 0, inter / jnp.maximum(union, 1e-12), 0.0)


def pairwise_iou_nocheck(ref_box: jnp.ndarray, boxes: jnp.ndarray) -> jnp.ndarray:
    """The CALD-scoring IoU of one reference box against many boxes.

    Matches /root/reference/cald_train.py:203-210 exactly: intersection width/height
    are NOT clamped before the ratio; instead entries with a negative width or
    height are zeroed afterwards. (A zero width/height already yields iou 0.)

    ref_box: (..., 4); boxes: (..., M, 4) -> (..., M).
    """
    rb = ref_box[..., None, :]
    width = jnp.minimum(rb[..., 2], boxes[..., 2]) - jnp.maximum(rb[..., 0], boxes[..., 0])
    height = jnp.minimum(rb[..., 3], boxes[..., 3]) - jnp.maximum(rb[..., 1], boxes[..., 1])
    a_area = (rb[..., 2] - rb[..., 0]) * (rb[..., 3] - rb[..., 1])
    b_area = (boxes[..., 2] - boxes[..., 0]) * (boxes[..., 3] - boxes[..., 1])
    inter = width * height
    denom = a_area + b_area - inter
    iou = inter / jnp.where(denom == 0, 1.0, denom)
    iou = jnp.where((width < 0) | (height < 0), 0.0, iou)
    return iou


def clip_boxes(boxes: jnp.ndarray, image_hw) -> jnp.ndarray:
    """Clip boxes to ``[0, w] x [0, h]``. ``image_hw`` is (h, w) (scalars or arrays
    broadcastable against the leading dims of ``boxes``)."""
    h, w = image_hw
    x1 = jnp.clip(boxes[..., 0], 0.0, w)
    y1 = jnp.clip(boxes[..., 1], 0.0, h)
    x2 = jnp.clip(boxes[..., 2], 0.0, w)
    y2 = jnp.clip(boxes[..., 3], 0.0, h)
    return jnp.stack([x1, y1, x2, y2], axis=-1)


def remove_small_boxes_mask(boxes: jnp.ndarray, min_size: float) -> jnp.ndarray:
    """Boolean mask of boxes with both sides >= min_size (torchvision
    ``remove_small_boxes``)."""
    ws = boxes[..., 2] - boxes[..., 0]
    hs = boxes[..., 3] - boxes[..., 1]
    return (ws >= min_size) & (hs >= min_size)


def _xyxy_to_cxcywh(boxes: jnp.ndarray):
    w = boxes[..., 2] - boxes[..., 0]
    h = boxes[..., 3] - boxes[..., 1]
    cx = boxes[..., 0] + 0.5 * w
    cy = boxes[..., 1] + 0.5 * h
    return cx, cy, w, h


def encode_boxes(reference: jnp.ndarray, proposals: jnp.ndarray,
                 weights=(1.0, 1.0, 1.0, 1.0)) -> jnp.ndarray:
    """Encode ``reference`` (gt) boxes relative to ``proposals`` (anchors).

    Same math as torchvision ``BoxCoder.encode_single``. Shapes ``(..., 4)``.
    """
    wx, wy, ww, wh = weights
    px, py, pw, ph = _xyxy_to_cxcywh(proposals)
    gx, gy, gw, gh = _xyxy_to_cxcywh(reference)
    pw = jnp.maximum(pw, 1e-8)
    ph = jnp.maximum(ph, 1e-8)
    tx = wx * (gx - px) / pw
    ty = wy * (gy - py) / ph
    tw = ww * jnp.log(jnp.maximum(gw, 1e-8) / pw)
    th = wh * jnp.log(jnp.maximum(gh, 1e-8) / ph)
    return jnp.stack([tx, ty, tw, th], axis=-1)


def decode_boxes(deltas: jnp.ndarray, proposals: jnp.ndarray,
                 weights=(1.0, 1.0, 1.0, 1.0)) -> jnp.ndarray:
    """Decode regression ``deltas`` on top of ``proposals``.

    ``deltas`` may be ``(..., N, 4)`` or ``(..., N, C, 4)`` against proposals
    ``(..., N, 4)`` (class-specific regression); broadcasting handles both.
    """
    wx, wy, ww, wh = weights
    px, py, pw, ph = _xyxy_to_cxcywh(proposals)
    dx = deltas[..., 0] / wx
    dy = deltas[..., 1] / wy
    dw = jnp.clip(deltas[..., 2] / ww, max=BBOX_XFORM_CLIP)
    dh = jnp.clip(deltas[..., 3] / wh, max=BBOX_XFORM_CLIP)
    if deltas.ndim == proposals.ndim + 1:  # class-specific: (..., N, C, 4)
        px, py, pw, ph = (t[..., None] for t in (px, py, pw, ph))
    cx = dx * pw + px
    cy = dy * ph + py
    w = jnp.exp(dw) * pw
    h = jnp.exp(dh) * ph
    x1 = cx - 0.5 * w
    y1 = cy - 0.5 * h
    x2 = cx + 0.5 * w
    y2 = cy + 0.5 * h
    return jnp.stack([x1, y1, x2, y2], axis=-1)


def resize_boxes(boxes: jnp.ndarray, from_hw, to_hw) -> jnp.ndarray:
    """Rescale boxes from one image size to another (h, w) -> (h', w').

    Mirrors /root/reference/detection/frcnn_la.py:307-315.
    """
    fh, fw = from_hw
    th, tw = to_hw
    ry = th / fh
    rx = tw / fw
    scale = jnp.stack([jnp.asarray(rx), jnp.asarray(ry), jnp.asarray(rx), jnp.asarray(ry)], axis=-1)
    return boxes * scale
