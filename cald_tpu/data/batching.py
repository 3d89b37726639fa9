"""Fixed-shape batching: resize -> canvas padding -> dense Batch pytree.

This replaces three reference mechanisms at once (SURVEY.md §2.1):
  - ``GeneralizedRCNNTransform``'s per-image min/max-side resize + batch padding
    (/root/reference/detection/frcnn_la.py:230-234): we resize with the same
    ``scale = min(min_size/min_side, max_size/max_side)`` rule, but pad onto one
    of a small static set of canvases so XLA compiles one program per canvas.
  - ``GroupedBatchSampler`` / ``create_aspect_ratio_groups``
    (/root/reference/detection/group_by_aspect_ratio.py:23-81,186-195): same
    log-spaced quantized aspect-ratio bins, same padding of leftover groups by
    repeating that group's indices.
  - ``collate_fn = tuple(zip(*batch))`` (utils.py:235-236): becomes a dense
    pytree with validity masks — no ragged structures cross the host boundary.
"""

from __future__ import annotations

import bisect
import dataclasses
import itertools
from typing import Sequence

import numpy as np
from flax import struct


@struct.dataclass
class Batch:
    """One device-ready padded batch. All arrays are dense and fixed-shape.

    images:    (B, H, W, 3) float32, raw 0..255 pixels (normalization is fused
               into the model preprocess).
    valid_hw:  (B, 2) int32 — the resized (pre-padding) height/width.
    scale:     (B,) float32 — resized / original scale factor (for mapping
               detections back to original coordinates).
    boxes:     (B, K, 4) float32 xyxy in RESIZED coordinates.
    labels:    (B, K) int32 (0 = padding/background slot).
    box_valid: (B, K) bool.
    image_idx: (B,) int32 — index into the host dataset (recovers ids/metadata).
    """

    images: np.ndarray
    valid_hw: np.ndarray
    scale: np.ndarray
    boxes: np.ndarray
    labels: np.ndarray
    box_valid: np.ndarray
    image_idx: np.ndarray

    @property
    def batch_size(self) -> int:
        return self.images.shape[0]


@dataclasses.dataclass(frozen=True)
class Canvas:
    height: int
    width: int

    def fits(self, h: float, w: float) -> bool:
        return h <= self.height and w <= self.width


def default_canvases(min_size: int, max_size: int, multiple: int = 64) -> tuple[Canvas, ...]:
    """Two canvases (landscape, portrait) covering every min/max-side resize.

    After the reference resize rule the long side is <= max_size and the short
    side is <= min_size * (long/short scaling never grows past it for non-square
    inputs); a square image can reach min_size on both sides. Rounding up to
    ``multiple`` keeps FPN levels (stride 64 at P7) exact and MXU-friendly.
    """
    def up(x):
        return int(-(-x // multiple) * multiple)

    short = up(min_size)
    long = up(max_size)
    return (Canvas(short, long), Canvas(long, short))


def resize_scale(h: int, w: int, min_size: int, max_size: int) -> float:
    """torchvision GeneralizedRCNNTransform scale rule."""
    min_side, max_side = min(h, w), max(h, w)
    return min(min_size / min_side, max_size / max_side)


def choose_canvas(h: int, w: int, canvases: Sequence[Canvas]) -> Canvas:
    """Smallest-area canvas that fits a resized (h, w) image."""
    fitting = [c for c in canvases if c.fits(h, w)]
    if not fitting:
        # fall back to the largest canvas; the image is further downscaled later.
        return max(canvases, key=lambda c: c.height * c.width)
    return min(fitting, key=lambda c: c.height * c.width)


def resize_image(image: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """Bilinear resize on host via PIL (matches torchvision's interpolate
    closely enough; the model itself never resizes)."""
    from PIL import Image

    if image.shape[0] == out_h and image.shape[1] == out_w:
        return image.astype(np.float32)
    pil = Image.fromarray(image.astype(np.uint8))
    return np.asarray(pil.resize((out_w, out_h), Image.BILINEAR), np.float32)


def make_padded_batch(images: Sequence[np.ndarray], records, canvas: Canvas,
                      *, min_size: int, max_size: int, max_boxes: int,
                      indices: Sequence[int],
                      boxes_override: Sequence[np.ndarray] | None = None) -> Batch:
    """Resize each image per the reference rule, paste onto the canvas, pad targets.

    ``images`` are raw uint8/float (H, W, 3) arrays aligned with ``records``.
    ``boxes_override`` (e.g. post-flip boxes) replaces each record's boxes.
    """
    b = len(images)
    out_img = np.zeros((b, canvas.height, canvas.width, 3), np.float32)
    valid_hw = np.zeros((b, 2), np.int32)
    scales = np.zeros((b,), np.float32)
    boxes = np.zeros((b, max_boxes, 4), np.float32)
    labels = np.zeros((b, max_boxes), np.int32)
    box_valid = np.zeros((b, max_boxes), bool)

    for i, (img, rec) in enumerate(zip(images, records)):
        h, w = img.shape[:2]
        s = resize_scale(h, w, min_size, max_size)
        # shrink further if the canvas is smaller than the resize target
        s = min(s, canvas.height / h, canvas.width / w)
        rh, rw = int(round(h * s)), int(round(w * s))
        out_img[i, :rh, :rw] = resize_image(img, rh, rw)
        valid_hw[i] = (rh, rw)
        scales[i] = s
        src = boxes_override[i] if boxes_override is not None else rec.boxes
        n = min(len(src), max_boxes)
        if n:
            boxes[i, :n] = src[:n] * s
            labels[i, :n] = rec.labels[:n]
            box_valid[i, :n] = True
    return Batch(images=out_img, valid_hw=valid_hw, scale=scales, boxes=boxes,
                 labels=labels, box_valid=box_valid,
                 image_idx=np.asarray(indices, np.int32))


# ---------------------------------------------------------------------------
# Aspect-ratio grouping (reference group_by_aspect_ratio.py:47-81,186-195)
# ---------------------------------------------------------------------------

def create_aspect_ratio_groups(aspect_ratios: np.ndarray, k: int = 3) -> np.ndarray:
    """Quantize w/h ratios into 2k+1 log-spaced bins over [1/2, 2]
    (group_by_aspect_ratio.py:186-195). Returns a group id per image."""
    bins = (2.0 ** np.linspace(-1, 1, 2 * k + 1)).tolist() if k > 0 else [1.0]
    return np.asarray([bisect.bisect_right(bins, r) for r in aspect_ratios], np.int64)


def grouped_batch_indices(indices: Sequence[int], group_ids: np.ndarray,
                          batch_size: int, rng: np.random.Generator | None = None,
                          *, drop_incomplete: bool = False) -> list[list[int]]:
    """Yield batches whose members share a group id.

    Mirrors GroupedBatchSampler (group_by_aspect_ratio.py:47-81): optional
    shuffle, then fill per-group buffers; leftover partial batches are padded by
    repeating indices from the same group so every batch has exactly
    ``batch_size`` elements (=> one static batch shape).
    """
    order = list(indices)
    if rng is not None:
        order = [order[i] for i in rng.permutation(len(order))]

    buffers: dict[int, list[int]] = {}
    batches: list[list[int]] = []
    for idx in order:
        g = int(group_ids[idx])
        buf = buffers.setdefault(g, [])
        buf.append(idx)
        if len(buf) == batch_size:
            batches.append(list(buf))
            buf.clear()
    if not drop_incomplete:
        for g, buf in buffers.items():
            if buf:
                pad = list(itertools.islice(itertools.cycle(buf), batch_size - len(buf)))
                batches.append(buf + pad)
    return batches
