"""RoIAlign on TPU (pure XLA gathers + bilinear weights).

TPU-native replacement for torchvision's C++/CUDA ``roi_align`` and
``MultiScaleRoIAlign`` (/root/reference/detection/frcnn_la.py:206-209): identical
sampling semantics (``aligned=False``, ``sampling_ratio=2``) and the FPN level
assignment formula ``k = floor(4 + log2(sqrt(area)/224))`` clamped to [2, 5].

Multi-scale design (the detect path's dominant cost — see PERF.md for the
measured formulation shoot-out): the pyramid is flattened to one (P, C) buffer,
each roi gathers only at its assigned level, every bilinear x-pair is ONE
contiguous (2, C) slice with clamped-base weights, gathered corners stay in the
feature dtype (bf16), and rois are processed in fixed-size chunks via
``lax.map`` to bound the transient footprint. A row-window + interpolation
matmul variant (method='window') is kept as the blueprint for a future
Pallas-DMA kernel.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


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


WINDOW_SPAN = 64


def multi_scale_roi_align(feats, rois: jnp.ndarray, *, spatial_scales,
                          output_size: int = 7, sampling_ratio: int = 2,
                          chunk_size: int = 256,
                          method: str = "points") -> jnp.ndarray:
    """RoIAlign over an FPN pyramid with per-roi level assignment.

    feats: list of (H_l, W_l, C) arrays (finest first); spatial_scales: matching
    list of floats (e.g. 1/4, 1/8, 1/16, 1/32). rois: (N, 4).
    Returns (N, output_size, output_size, C).

    TPU formulation: the whole pyramid is flattened into one (sum H_l*W_l, C)
    buffer and every roi gathers ONLY at its assigned level through per-roi
    level offsets — one gather pass instead of aligning each roi at all levels
    (4x less gather traffic than the masked-sum formulation; RoIAlign is the
    detect path's dominant cost).

    method:
      'points' (default): pointwise paired-corner (2, C) slices — exact for
        every roi. Measured at ~35M gather descriptors/s, which is XLA's
        practical gather ceiling on v5e (PERF.md).
      'window': one contiguous (WINDOW_SPAN, C) row slice per (roi,
        sample-row) + per-roi interpolation matmul. Exact while the roi's
        width at its assigned level is <= span - 2 (level mapper keeps
        sqrt(area)/stride in [14, 28), covering aspect ratios to ~4.5; wider
        rois clamp the outermost columns). SLOWER in practice: XLA lowers
        large-slice gathers ~35x less efficiently than small ones (1M vs 35M
        descriptors/s) — kept for the planned Pallas-DMA variant to reuse.

    The level-mapper range is derived from the scales like torchvision's
    ``MultiScaleRoIAlign.setup_scales`` (k = -log2(scale)), so single-level and
    equal-stride pyramids (MobileNetV3) degrade gracefully.
    """
    import math

    k_min = int(round(-math.log2(spatial_scales[0])))
    k_max = int(round(-math.log2(spatial_scales[-1])))
    levels = jnp.clip(fpn_level_assignment(rois, k_min=k_min, k_max=k_max),
                      0, len(feats) - 1)                                # (R,)

    c = feats[0].shape[-1]
    hs = jnp.asarray([f.shape[0] for f in feats], jnp.float32)
    ws = jnp.asarray([f.shape[1] for f in feats], jnp.float32)
    sizes = [f.shape[0] * f.shape[1] for f in feats]
    offs = jnp.asarray(np.cumsum([0] + sizes[:-1]), jnp.int32)
    flat = jnp.concatenate([f.reshape(-1, c) for f in feats], axis=0)  # (P, C)
    if method == "window":
        # tail pad: window slices near the last rows must never clamp their
        # start (that would silently shift the window content)
        flat = jnp.concatenate(
            [flat, jnp.zeros((WINDOW_SPAN, c), flat.dtype)], axis=0)
    scales = jnp.asarray(list(spatial_scales), jnp.float32)

    n = rois.shape[0]
    s = output_size * sampling_ratio

    def align_chunk(args):
        rois_c, levels_c = args
        r = rois_c.shape[0]
        scale = scales[levels_c]                                       # (R,)
        h_l = hs[levels_c]
        w_l = ws[levels_c]
        off = offs[levels_c]

        x1 = rois_c[:, 0] * scale
        y1 = rois_c[:, 1] * scale
        roi_w = jnp.maximum(rois_c[:, 2] * scale - x1, 1.0)
        roi_h = jnp.maximum(rois_c[:, 3] * scale - y1, 1.0)
        # coords always in f32 (bf16 features must not degrade sampling)
        steps = (jnp.arange(s, dtype=jnp.float32) + 0.5) / sampling_ratio
        ys = y1[:, None] + steps[None] * (roi_h / output_size)[:, None]  # (R, S)
        xs = x1[:, None] + steps[None] * (roi_w / output_size)[:, None]

        in_y = (ys >= -1.0) & (ys <= h_l[:, None])
        in_x = (xs >= -1.0) & (xs <= w_l[:, None])
        y = jnp.clip(ys, 0.0, h_l[:, None] - 1.0)
        x = jnp.clip(xs, 0.0, w_l[:, None] - 1.0)
        # clamped-base bilinear: base = min(floor(v), n-2), frac = v - base in
        # [0, 1] — exact (frac hits 1.0 at the boundary) and lets each x-pair
        # be ONE contiguous (2, C) slice instead of two row gathers.
        y0 = jnp.clip(jnp.floor(y), 0.0, h_l[:, None] - 2.0).astype(jnp.int32)
        x0 = jnp.clip(jnp.floor(x), 0.0, w_l[:, None] - 2.0).astype(jnp.int32)
        # weights in the FEATURE dtype: gathered bf16 tensors must not be
        # upcast to f32 (4x (R,S,S,C) f32 temps OOM'd the scoring program)
        ly = (y - y0)[:, :, None].astype(flat.dtype)                   # (R, S, 1)
        lx = (x - x0)[:, None, :].astype(flat.dtype)                   # (R, 1, S)
        hy, hx = 1.0 - ly, 1.0 - lx

        w_i = w_l.astype(jnp.int32)

        if method == "window":
            span = WINDOW_SPAN
            # per-roi window start covering the (ascending) x sample positions
            xw0 = jnp.clip(x0[:, 0], 0,
                           jnp.maximum(w_i - span, 0)).astype(jnp.int32)  # (R,)
            rx = jnp.clip(x[:, :] - xw0[:, None].astype(jnp.float32),
                          0.0, float(span - 2))                        # (R, S)
            rx0 = jnp.floor(rx)
            rfrac = (rx - rx0).astype(flat.dtype)
            kk = jnp.arange(span, dtype=jnp.float32)[None, None, :]
            wx = (jnp.where(kk == rx0[:, :, None], (1.0 - rfrac)[:, :, None], 0.0)
                  + jnp.where(kk == rx0[:, :, None] + 1.0, rfrac[:, :, None], 0.0))
            wx = jnp.where(in_x[:, :, None], wx, 0.0).astype(flat.dtype)  # (R,S,span)
            # the sub-bin MEAN is linear: fold it into the weights/rows now —
            # halves every intermediate and the einsum output is final
            sr = sampling_ratio
            wx_pool = wx.reshape(r, output_size, sr, span).mean(axis=2)

            def take_rows(yi):                                         # (R,S,span,C)
                p = (off[:, None] + yi * w_i[:, None] + xw0[:, None]).reshape(-1)
                g = jax.vmap(lambda i: jax.lax.dynamic_slice(
                    flat, (i, 0), (span, c)))(p)
                return g.reshape(r, s, span, c)

            rows = (take_rows(y0) * (1.0 - ly)[..., None]
                    + take_rows(y0 + 1) * ly[..., None])               # (R,S,span,C)
            rows = jnp.where(in_y[..., None, None], rows,
                             jnp.zeros((), flat.dtype))
            rows_pool = rows.reshape(r, output_size, sr, span, c).mean(axis=2)
            # horizontal interpolation as a per-roi matmul on the MXU
            # (HIGHEST precision: the TPU default runs f32 matmuls as bf16
            # passes — 3e-3 error that breaks torchvision-parity tests; bf16
            # feature inputs are unaffected either way)
            return jnp.einsum("rxk,rykc->ryxc", wx_pool, rows_pool,
                              preferred_element_type=jnp.float32,
                              precision=jax.lax.Precision.HIGHEST
                              ).astype(jnp.float32)
        else:
            def take_pair(yi):                                         # (R,S,S,2,C)
                """For each sample point: flat rows [p, p+1] = the (x0, x0+1)
                pair of row yi — one contiguous (2, C) slice per point."""
                p = (off[:, None, None] + yi[:, :, None] * w_i[:, None, None]
                     + x0[:, None, :]).reshape(-1)
                g = jax.vmap(lambda i: jax.lax.dynamic_slice(flat, (i, 0), (2, c)))(p)
                return g.reshape(r, s, s, 2, c)

            def lerp_x(pair):                                          # (R,S,S,C)
                return (pair[..., 0, :] * hx[..., None]
                        + pair[..., 1, :] * lx[..., None])

            out = hy[..., None] * lerp_x(take_pair(y0))
            out += ly[..., None] * lerp_x(take_pair(y0 + 1))
            inside = (in_y[:, :, None] & in_x[:, None, :])[..., None]
            out = jnp.where(inside, out, jnp.zeros((), flat.dtype))
        # the 2x2 sub-bin mean accumulates in f32
        return out.reshape(r, output_size, sampling_ratio, output_size,
                           sampling_ratio, c).astype(jnp.float32).mean(axis=(2, 4))

    if n <= chunk_size:
        return align_chunk((rois, levels))
    pad = (-n) % chunk_size
    rois_p = jnp.pad(rois, ((0, pad), (0, 0))).reshape(-1, chunk_size, 4)
    levels_p = jnp.pad(levels, (0, pad)).reshape(-1, chunk_size)
    out = jax.lax.map(align_chunk, (rois_p, levels_p))
    return out.reshape(-1, output_size, output_size, c)[:n]
