"""Anchor generation (torchvision ``AnchorGenerator`` semantics, static shapes).

The reference generates anchors per image at runtime
(frcnn_la.py:186-190, retinanet_cal.py:341-350); under jit the feature-map
shapes are static, so anchors are pure constants folded by XLA.

Cell anchors: for each (size s, aspect a): h = s*sqrt(a), w = s/sqrt(a), rounded
like torchvision (round()); grid anchors place each cell anchor at every stride
offset: centers at (x*stride, y*stride) — torchvision uses the top-left corner
convention with shifts = arange * stride.
"""

from __future__ import annotations

import math
from typing import Sequence

import jax.numpy as jnp
import numpy as np


def cell_anchors(sizes: Sequence[float], aspect_ratios: Sequence[float]) -> np.ndarray:
    """(len(sizes)*len(aspects), 4) xyxy anchors centered at the origin."""
    out = []
    for s in sizes:
        for a in aspect_ratios:
            h = s * math.sqrt(a)
            w = s / math.sqrt(a)
            out.append([-w / 2.0, -h / 2.0, w / 2.0, h / 2.0])
    return np.round(np.asarray(out, np.float32))


def grid_anchors_for_level(feat_h: int, feat_w: int, stride: int,
                           sizes: Sequence[float],
                           aspect_ratios: Sequence[float]) -> jnp.ndarray:
    """All anchors for one feature level, shape (H*W*A, 4), row-major over
    (y, x, anchor) — matching torchvision's ordering (shifts repeat-interleaved
    against cell anchors)."""
    cells = cell_anchors(sizes, aspect_ratios)                 # (A, 4)
    shift_x = np.arange(feat_w, dtype=np.float32) * stride
    shift_y = np.arange(feat_h, dtype=np.float32) * stride
    sx, sy = np.meshgrid(shift_x, shift_y)                      # (H, W)
    shifts = np.stack([sx, sy, sx, sy], axis=-1).reshape(-1, 1, 4)  # (HW, 1, 4)
    anchors = (shifts + cells[None]).reshape(-1, 4)             # (HW*A, 4)
    return jnp.asarray(anchors)


def generate_anchors(feat_shapes: Sequence[tuple[int, int]],
                     strides: Sequence[int],
                     sizes_per_level: Sequence[Sequence[float]],
                     aspect_ratios: Sequence[float]):
    """Anchors for a whole pyramid.

    Returns (anchors (sum_i H_i*W_i*A, 4) jnp array, counts per level list).
    """
    per_level = [
        grid_anchors_for_level(h, w, st, sz, aspect_ratios)
        for (h, w), st, sz in zip(feat_shapes, strides, sizes_per_level)
    ]
    counts = [int(a.shape[0]) for a in per_level]
    return jnp.concatenate(per_level, axis=0), counts


# Reference anchor schedules.
FRCNN_SIZES = ((32,), (64,), (128,), (256,), (512,))          # frcnn_la.py:186-190
RETINA_SIZES = tuple(
    tuple(x * 2 ** (i / 3) for i in range(3))
    for x in (32, 64, 128, 256, 512)
)                                                              # retinanet_cal.py:347
MOBILE_RETINA_SIZES = ((16, 32, 64, 128, 256),)               # retinanet_cal.py:663
ASPECT_RATIOS = (0.5, 1.0, 2.0)
