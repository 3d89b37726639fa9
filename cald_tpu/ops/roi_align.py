"""RoIAlign on TPU (pure XLA gathers + bilinear weights).

TPU-native replacement for torchvision's C++/CUDA ``roi_align`` and
``MultiScaleRoIAlign`` (/root/reference/detection/frcnn_la.py:206-209): identical
sampling semantics (``aligned=False``, ``sampling_ratio=2``) and the FPN level
assignment formula ``k = floor(4 + log2(sqrt(area)/224))`` clamped to [2, 5].

Design: all sample-point coordinates for a chunk of RoIs are computed at once and
resolved with four gathers + bilinear weighting; the (out*sr, out*sr) grid is then
mean-pooled to (out, out). RoIs are processed in fixed-size chunks via ``lax.map``
to bound the transient gather footprint in HBM.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


def _bilinear_sample(feat: jnp.ndarray, ys: jnp.ndarray, xs: jnp.ndarray) -> jnp.ndarray:
    """Bilinear sampling with torchvision roi_align border handling.

    feat: (H, W, C); ys/xs: (...,) sample coordinates in feature pixels.
    Points with y < -1 or y > H (resp. x) contribute zero; otherwise coords are
    clamped into [0, H-1] / [0, W-1].
    Returns (..., C).
    """
    h, w, _ = feat.shape
    inside = (ys >= -1.0) & (ys <= h) & (xs >= -1.0) & (xs <= w)
    y = jnp.clip(ys, 0.0, h - 1.0)
    x = jnp.clip(xs, 0.0, w - 1.0)
    y0 = jnp.floor(y).astype(jnp.int32)
    x0 = jnp.floor(x).astype(jnp.int32)
    y1 = jnp.minimum(y0 + 1, h - 1)
    x1 = jnp.minimum(x0 + 1, w - 1)
    ly = y - y0.astype(y.dtype)
    lx = x - x0.astype(x.dtype)
    hy = 1.0 - ly
    hx = 1.0 - lx

    v00 = feat[y0, x0]
    v01 = feat[y0, x1]
    v10 = feat[y1, x0]
    v11 = feat[y1, x1]
    out = (hy * hx)[..., None] * v00 + (hy * lx)[..., None] * v01 \
        + (ly * hx)[..., None] * v10 + (ly * lx)[..., None] * v11
    return jnp.where(inside[..., None], out, 0.0)


def _roi_align_chunk(feat: jnp.ndarray, rois: jnp.ndarray, *, spatial_scale: float,
                     output_size: int, sampling_ratio: int) -> jnp.ndarray:
    """RoIAlign of one chunk of rois against a single feature map.

    feat: (H, W, C); rois: (R, 4) in image coords -> (R, output_size, output_size, C).
    """
    r = rois.shape[0]
    sr = sampling_ratio
    x1 = rois[:, 0] * spatial_scale
    y1 = rois[:, 1] * spatial_scale
    x2 = rois[:, 2] * spatial_scale
    y2 = rois[:, 3] * spatial_scale
    roi_w = jnp.maximum(x2 - x1, 1.0)
    roi_h = jnp.maximum(y2 - y1, 1.0)
    bin_w = roi_w / output_size
    bin_h = roi_h / output_size

    # Sample grid: (output_size * sr) points per axis, centered in each sub-bin.
    steps = (jnp.arange(output_size * sr, dtype=feat.dtype) + 0.5) / sr
    ys = y1[:, None] + steps[None, :] * bin_h[:, None]  # (R, S)
    xs = x1[:, None] + steps[None, :] * bin_w[:, None]
    ys = jnp.broadcast_to(ys[:, :, None], (r, output_size * sr, output_size * sr))
    xs = jnp.broadcast_to(xs[:, None, :], (r, output_size * sr, output_size * sr))

    sampled = _bilinear_sample(feat, ys, xs)  # (R, S, S, C)
    # Mean over each sr x sr sub-grid.
    s = output_size
    sampled = sampled.reshape(r, s, sr, s, sr, -1)
    return sampled.mean(axis=(2, 4))


@partial(jax.jit, static_argnames=("spatial_scale", "output_size", "sampling_ratio",
                                   "chunk_size"))
def roi_align(feat: jnp.ndarray, rois: jnp.ndarray, *, spatial_scale: float,
              output_size: int = 7, sampling_ratio: int = 2,
              chunk_size: int = 256) -> jnp.ndarray:
    """Single-level RoIAlign. feat: (H, W, C); rois: (N, 4) image-space boxes."""
    n = rois.shape[0]
    if n <= chunk_size:
        return _roi_align_chunk(feat, rois, spatial_scale=spatial_scale,
                                output_size=output_size, sampling_ratio=sampling_ratio)
    pad = (-n) % chunk_size
    rois_p = jnp.pad(rois, ((0, pad), (0, 0)))
    chunks = rois_p.reshape(-1, chunk_size, 4)
    out = jax.lax.map(
        lambda c: _roi_align_chunk(feat, c, spatial_scale=spatial_scale,
                                   output_size=output_size,
                                   sampling_ratio=sampling_ratio), chunks)
    return out.reshape(-1, output_size, output_size, feat.shape[-1])[:n]


def fpn_level_assignment(rois: jnp.ndarray, *, k_min: int = 2, k_max: int = 5,
                         canonical_scale: float = 224.0,
                         canonical_level: int = 4) -> jnp.ndarray:
    """FPN heuristic level per roi (torchvision ``LevelMapper``): returns values in
    [0, k_max - k_min] indexing the pyramid list."""
    ws = rois[:, 2] - rois[:, 0]
    hs = rois[:, 3] - rois[:, 1]
    s = jnp.sqrt(jnp.maximum(ws * hs, 0.0))
    lvl = jnp.floor(canonical_level + jnp.log2(s / canonical_scale + 1e-6))
    lvl = jnp.clip(lvl, k_min, k_max)
    return (lvl - k_min).astype(jnp.int32)


def multi_scale_roi_align(feats, rois: jnp.ndarray, *, spatial_scales,
                          output_size: int = 7, sampling_ratio: int = 2,
                          chunk_size: int = 256) -> jnp.ndarray:
    """RoIAlign over an FPN pyramid with per-roi level assignment.

    feats: list of (H_l, W_l, C) arrays (finest first); spatial_scales: matching
    list of floats (e.g. 1/4, 1/8, 1/16, 1/32). rois: (N, 4).
    Returns (N, output_size, output_size, C).

    Each level aligns every roi (rois assigned elsewhere contribute via a select);
    with 4 levels this costs 4x the gathers of a perfect scatter but keeps shapes
    static and the kernel trivially fusable.

    The level-mapper range is derived from the scales like torchvision's
    ``MultiScaleRoIAlign.setup_scales`` (k = -log2(scale)), so single-level and
    equal-stride pyramids (MobileNetV3) degrade gracefully.
    """
    import math

    k_min = int(round(-math.log2(spatial_scales[0])))
    k_max = int(round(-math.log2(spatial_scales[-1])))
    levels = fpn_level_assignment(rois, k_min=k_min, k_max=k_max)
    levels = jnp.clip(levels, 0, len(feats) - 1)
    out = None
    for i, (feat, scale) in enumerate(zip(feats, spatial_scales)):
        aligned = roi_align(feat, rois, spatial_scale=scale, output_size=output_size,
                            sampling_ratio=sampling_ratio, chunk_size=chunk_size)
        mask = (levels == i).astype(aligned.dtype)[:, None, None, None]
        out = aligned * mask if out is None else out + aligned * mask
    return out
