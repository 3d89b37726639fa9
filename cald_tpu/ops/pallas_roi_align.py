"""Multi-scale RoIAlign as a Pallas TPU kernel: one window DMA per roi.

XLA's gather tops out at ~35M small descriptors/s on v5e, putting the pointwise
RoIAlign at ~11 ms per image x 1000 rois (PERF.md). Here each roi issues ONE
strided rectangular DMA — the feature window at its assigned level — into VMEM,
and the bilinear sampling + 2x2 mean-pool collapse into two small interpolation
matmuls (weights built outside the kernel).

Round-3 measurements (PERF.md): the stage is NOT DMA-bandwidth-bound at the
fast-scoring roi counts — per-roi size-bucketed DMAs (4x4 static size classes
into a slice of the worst-case scratch; zero interpolation weights make the
stale remainder inert) halved the bytes moved and made the stage SLOWER
(branch dispatch on the scalar core), and double-buffering the window DMA
against the compute was neutral. The kernel therefore runs the double-buffered
single-size-class configuration (_buckets returns just the envelope); the
bucket plumbing stays parametrized for future re-tuning at higher roi counts,
where bandwidth does dominate.

Exactness: identical to method='points' whenever the roi spans at most
win_h-2 rows and span-2 columns at its assigned FPN level (bucketing preserves
this: a bucket always covers the full sample extent or the roi lands in the
worst-case bucket with the old clamp semantics). More extreme rois clamp
their outermost samples to the window edge (sub-pixel error on a rare tail).

Autodiff: a custom_vjp makes the kernel trainable (the reference trains
through roi_align, frcnn_la.py:206-209). The backward is the transpose of the
forward's two interpolation contractions — gwin = wy^T @ gout @ wx per roi —
scattered back with one read-accumulate-write window DMA pair per roi (same
bucketed extents; gwin is zero outside them) into a zero-initialized gradient
buffer (input_output_aliased). TPU grid steps run sequentially on one core, so
the read-modify-write accumulation over overlapping roi windows is race-free
by construction. Rois get zero cotangents (torchvision's roi_align likewise
only differentiates the features; proposals are detached in the reference).

Constraints: C must be a multiple of 128 (Mosaic lane-aligned reshapes); HBM
slice starts must be W-tile (8) aligned (handled here via aligned window
starts + pl.multiple_of), and col bucket sizes are multiples of 8.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from cald_tpu.ops.roi_align import fpn_level_assignment

# Worst-case window envelopes (rows x cols; cols are a multiple of the HBM
# W-tile (8) and window starts are tile-aligned):
#  * inference/scoring: 44x48 — covers sqrt(area)/stride < 28 at aspect ratio
#    <= ~2.2 (rows) / ~2.7 (cols) exactly. Wider rois clamp their outermost
#    samples (score-parity tail, measured).
#  * training: 48x56 — aspect ~2.9 (rows) / ~4 (cols) envelope, so gradients
#    of elongated regressed boxes (anchors reach AR 2.0 and regression
#    overshoots) stay exact (ADVICE r2: don't let the scoring-path shrink
#    silently change training numerics).
WIN_INFER = (44, 48)
WIN_TRAIN = (48, 56)


def _buckets(limit: int) -> tuple:
    """DMA-size buckets ending at the envelope (col buckets stay W-tile
    multiples). Single bucket: branch-dispatch cost in the kernel outweighed
    the traffic saving (measured round 3) — the envelope is the bucket."""
    return (limit,)


def _nslots() -> int:
    """Window-DMA pipeline depth: how many roi windows can be in flight at
    once. 2 = classic double buffering (one outstanding copy). Deeper values
    keep nslots-1 copies outstanding — a lever against the per-roi DMA floor
    if the DMA engine pipelines independent copies (PERF.md round 3).
    Overridable for experiments via CALD_TPU_ROI_NSLOTS. Round-4 sweep:
    2 -> 3.81 us/roi, 4 -> 4.01, 8 -> 4.07 — copies do NOT pipeline past one
    outstanding on this chip; 2 stays the default."""
    return max(2, int(os.environ.get("CALD_TPU_ROI_NSLOTS", "2")))


def _group() -> int:
    """Rois per grid step for the grouped-matmul forward (0 = per-roi kernel).

    The round-3 campaign measured the per-roi kernel's ~3.5-4 us/roi floor as
    two OVERLAPPED costs — window-DMA bytes (~1.08 MB/roi at the 44x48
    envelope ~= the chip's ~263 GB/s) and per-step compute overhead (thin M=7
    interpolation matmuls + a 540k-element relayout) — which is why halving
    either side alone measured neutral (PERF.md round 3). The grouped kernel
    attacks both at once: levels are stored as flat 2D (H, W*C) memrefs so
    windows arrive matmul-ready (no in-kernel relayout; col starts become
    lane-granular so size buckets shrink DMA bytes without the W-tile-8
    constraint), and g rois share one pair of block-diagonal interpolation
    dot_generals (M=7g), amortizing the per-matmul issue cost."""
    return int(os.environ.get("CALD_TPU_ROI_GROUP", "0") or 0)


def _group_hi_prec() -> bool:
    """Grouped-kernel matmul precision: f32/HIGHEST (points-path-exact, like
    the per-roi kernel) vs bf16/DEFAULT (CALD_TPU_ROI_GROUP_PREC=bf16;
    round-3 measured bf16-without-upcast as score-parity-neutral)."""
    return os.environ.get("CALD_TPU_ROI_GROUP_PREC", "hi") != "bf16"


def _axis_weights(pos, base0, n_valid, inside, window, out_size, sr, dtype):
    """Pooled bilinear weights along one axis, relative to a window.

    pos: (R, S) sample positions (feature px); base0: (R,) window start;
    n_valid: (R,) valid extent; inside: (R, S) border mask.
    Returns (R, out_size, window).
    """
    r, s = pos.shape
    # position relative to the window, clamped to the valid extent (same as the
    # points path's clip to n-1) and to the window itself (wider-than-window
    # rois approximate their outermost samples at the edge)
    rel = jnp.clip(pos - base0[:, None].astype(jnp.float32), 0.0,
                   float(window - 1))
    rel = jnp.minimum(rel, jnp.maximum(n_valid[:, None] - base0[:, None] - 1.0, 0.0))
    # clamp the BASE, not the position: frac up to 1.0 selects the last column
    lo = jnp.clip(jnp.floor(rel), 0.0, float(window - 2))
    frac = rel - lo
    kk = jnp.arange(window, dtype=jnp.float32)[None, None, :]
    w = (jnp.where(kk == lo[:, :, None], (1.0 - frac)[:, :, None], 0.0)
         + jnp.where(kk == lo[:, :, None] + 1.0, frac[:, :, None], 0.0))
    w = jnp.where(inside[:, :, None], w, 0.0)
    # fold the sr-point sub-bin mean
    return w.reshape(r, out_size, sr, window).mean(axis=2).astype(dtype)


def _roi_kernel(lvl_ref, y0_ref, x0_ref, rb_ref, cb_ref, *refs,
                num_levels: int, c: int, win_h: int, span: int,
                row_buckets: tuple, col_buckets: tuple, nslots: int = 2):
    """Multi-slot round-robin window pipeline: step i waits for its own
    window (started nslots-1 steps earlier) and starts roi i+nslots-1's
    window into the slot roi i-1 just vacated, keeping up to nslots-1 copies
    outstanding — the stage runs at max(DMA, compute) instead of their sum.
    nslots=2 is classic double buffering."""
    fs = refs[:num_levels]
    wy_ref, wx_ref, out_ref, win2, sem2 = refs[num_levels:]
    i = pl.program_id(0)
    n = pl.num_programs(0)
    slot = jax.lax.rem(i, nslots)

    def window_dma(k, sl):
        """Guarded DMA starts/waits for roi k into slot sl (static branch per
        (level, row bucket, col bucket); exactly one fires)."""
        lvl = lvl_ref[k]
        y0 = y0_ref[k]
        x0 = pl.multiple_of(x0_ref[k], 8)   # host aligns starts to the W-tile
        rb = rb_ref[k]
        cb = cb_ref[k]

        def do(op):
            for l in range(num_levels):
                for bi, rh in enumerate(row_buckets):
                    for bj, cs in enumerate(col_buckets):
                        @pl.when((lvl == l) & (rb == bi) & (cb == bj))
                        def _(l=l, rh=rh, cs=cs):
                            op(pltpu.make_async_copy(
                                fs[l].at[pl.ds(y0, rh), pl.ds(x0, cs), :],
                                win2.at[sl, pl.ds(0, rh), pl.ds(0, cs), :],
                                sem2.at[sl]))
        return do

    @pl.when(i == 0)
    def _():
        # prime the pipeline: copies 0..nslots-2 (the steady-state rule below
        # fires for copy nslots-1 at this same step)
        for k in range(nslots - 1):
            @pl.when(jnp.asarray(k, jnp.int32) < n)
            def _(k=k):
                window_dma(jnp.asarray(k, jnp.int32),
                           jnp.asarray(k, jnp.int32))(lambda cp: cp.start())

    @pl.when(i + (nslots - 1) < n)
    def _():
        j = i + (nslots - 1)
        window_dma(j, jax.lax.rem(j, nslots))(lambda cp: cp.start())

    window_dma(i, slot)(lambda cp: cp.wait())

    w = win2[slot].astype(jnp.float32)             # (win_h, span, C)
    wy = wy_ref[0].astype(jnp.float32)             # (7, win_h)
    wx = wx_ref[0].astype(jnp.float32)             # (7, span)
    t = jax.lax.dot_general(wy, w.reshape(win_h, span * c),
                            (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32,
                            precision=jax.lax.Precision.HIGHEST)
    t = t.reshape(wy.shape[0], span, c)
    # contract span: out[y, x, c] = sum_w wx[x, w] t[y, w, c]
    out = jax.lax.dot_general(wx, t.transpose(1, 0, 2).reshape(span, -1),
                              (((1,), (0,)), ((), ())),
                              preferred_element_type=jnp.float32,
                              precision=jax.lax.Precision.HIGHEST)
    out_ref[0] = out.reshape(wx.shape[0], wy.shape[0], c).transpose(1, 0, 2)


def _bucketize(needed, buckets):
    """Index of the smallest bucket >= needed (or the last: clamp regime)."""
    idx = jnp.zeros(needed.shape, jnp.int32)
    for b in buckets[:-1]:
        idx += (needed > b).astype(jnp.int32)
    return jnp.clip(idx, 0, len(buckets) - 1)


def _plan(feats, rois, spatial_scales, output_size: int, sampling_ratio: int,
          win_h: int, span: int):
    """Shared fwd/bwd prolog: level assignment, zero-padded levels, bucketed
    aligned window starts, pooled interpolation weights."""
    import math

    row_buckets = _buckets(win_h)
    col_buckets = _buckets(span)
    s = output_size * sampling_ratio
    k_min = int(round(-math.log2(spatial_scales[0])))
    k_max = int(round(-math.log2(spatial_scales[-1])))
    levels = jnp.clip(fpn_level_assignment(rois, k_min=k_min, k_max=k_max),
                      0, len(feats) - 1)

    hs = jnp.asarray([f.shape[0] for f in feats], jnp.float32)
    ws = jnp.asarray([f.shape[1] for f in feats], jnp.float32)
    # coarse levels can be smaller than the DMA window: zero-pad them (the
    # interpolation weights are already masked to the true valid extent)
    padded = [jnp.pad(f, ((0, max(0, win_h - f.shape[0])),
                          (0, max(0, span - f.shape[1])), (0, 0)))
              if f.shape[0] < win_h or f.shape[1] < span else f for f in feats]
    hs_pad = jnp.asarray([f.shape[0] for f in padded], jnp.float32)
    ws_pad = jnp.asarray([f.shape[1] for f in padded], jnp.float32)
    scales = jnp.asarray(list(spatial_scales), jnp.float32)
    scale = scales[levels]
    h_l = hs[levels]
    w_l = ws[levels]

    x1 = rois[:, 0] * scale
    y1 = rois[:, 1] * scale
    roi_w = jnp.maximum(rois[:, 2] * scale - x1, 1.0)
    roi_h = jnp.maximum(rois[:, 3] * scale - y1, 1.0)
    steps = (jnp.arange(s, dtype=jnp.float32) + 0.5) / sampling_ratio
    ys = y1[:, None] + steps[None] * (roi_h / output_size)[:, None]
    xs = x1[:, None] + steps[None] * (roi_w / output_size)[:, None]
    in_y = (ys >= -1.0) & (ys <= h_l[:, None])
    in_x = (xs >= -1.0) & (xs <= w_l[:, None])
    y = jnp.clip(ys, 0.0, h_l[:, None] - 1.0)
    x = jnp.clip(xs, 0.0, w_l[:, None] - 1.0)

    # per-roi DMA bucket: smallest (rows, cols) covering the bilinear support
    # (floor(last)+1 plus the hi neighbor); col extent measured from the
    # W-tile-aligned start
    x0a = (jnp.floor(x[:, 0]) // 8) * 8
    need_r = jnp.floor(y[:, -1]) + 2.0 - jnp.floor(y[:, 0])
    need_c = jnp.floor(x[:, -1]) + 2.0 - x0a
    rb = _bucketize(need_r, row_buckets)
    cb = _bucketize(need_c, col_buckets)
    # stale scratch beyond a small bucket is killed by zero interpolation
    # weights, but UNINITIALIZED VMEM can hold NaN bit patterns and 0 * NaN
    # poisons the contraction — force the first nslots rois (the first write
    # into each pipeline slot) to the full-size bucket so their DMAs
    # initialize the whole scratch windows with finite features.
    # (Applied BEFORE the start clamps below so the full windows stay in
    # bounds.)
    ns = _nslots()
    rb = jnp.where(jnp.arange(rb.shape[0]) < ns, len(row_buckets) - 1, rb)
    cb = jnp.where(jnp.arange(cb.shape[0]) < ns, len(col_buckets) - 1, cb)
    rh = jnp.asarray(row_buckets, jnp.float32)[rb]
    cs = jnp.asarray(col_buckets, jnp.float32)[cb]

    # window starts: clamp so the bucket window fits inside the (padded) level;
    # the weight clamp keeps sampling within the valid extent
    yw0 = jnp.clip(jnp.floor(y[:, 0]), 0,
                   jnp.maximum(hs_pad[levels] - rh, 0)).astype(jnp.int32)
    # ws_pad and cs are both multiples of 8, so the clamp preserves alignment
    xw0 = jnp.clip(x0a, 0, jnp.maximum(ws_pad[levels] - cs, 0)).astype(jnp.int32)

    wy = _axis_weights(y, yw0, h_l, in_y, win_h, output_size, sampling_ratio,
                       jnp.float32)
    wx = _axis_weights(x, xw0, w_l, in_x, span, output_size, sampling_ratio,
                       jnp.float32)
    return padded, levels.astype(jnp.int32), yw0, xw0, rb, cb, wy, wx


def _fwd_call(padded, levels, yw0, xw0, rb, cb, wy, wx, *, output_size: int,
              win_h: int, span: int):
    c = padded[0].shape[-1]
    r = levels.shape[0]
    nslots = _nslots()
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=5,
        grid=(r,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY) for _ in padded]
        + [pl.BlockSpec((1, output_size, win_h), lambda i, *_: (i, 0, 0)),
           pl.BlockSpec((1, output_size, span), lambda i, *_: (i, 0, 0))],
        out_specs=pl.BlockSpec((1, output_size, output_size, c),
                               lambda i, *_: (i, 0, 0, 0)),
        scratch_shapes=[pltpu.VMEM((nslots, win_h, span, c), padded[0].dtype),
                        pltpu.SemaphoreType.DMA((nslots,))],
    )
    extra = {}
    if nslots > 2:  # deeper pipelines outgrow the 16 MB default scoped VMEM
        extra["compiler_params"] = pltpu.CompilerParams(
            vmem_limit_bytes=96 * 1024 * 1024)
    return pl.pallas_call(
        functools.partial(_roi_kernel, num_levels=len(padded), c=c,
                          win_h=win_h, span=span,
                          row_buckets=_buckets(win_h),
                          col_buckets=_buckets(span), nslots=nslots),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((r, output_size, output_size, c),
                                       jnp.float32),
        **extra,
    )(levels, yw0, xw0, rb, cb, *padded, wy, wx)


# ---------------------------------------------------------------------------
# Grouped-matmul forward (opt-in via CALD_TPU_ROI_GROUP, see _group()).
# ---------------------------------------------------------------------------

_GROUP_ROWS_ENV = 56          # row envelope: win_h (<=48) + <=7 8-align slack
_GROUP_ROW_BUCKETS = (24, 40, _GROUP_ROWS_ENV)


def _roi_group_kernel(lvl_ref, y0_ref, x0c_ref, rb_ref, cb_ref, *refs,
                      num_levels: int, c: int, g: int, rows_env: int,
                      span: int, row_buckets: tuple, col_buckets: tuple,
                      nslots: int, hi_prec: bool):
    """g rois per grid step over FLAT 2D levels (H_l, W_l*C).

    Step i waits for its g window copies (row bands j*rows_env of its slot)
    and starts step i+nslots-1's g copies; the whole slot band then feeds ONE
    block-diagonal y-contraction (g*7, g*rows_env) @ (g*rows_env, span*c) and
    one block-diagonal x-contraction (g*7, g*span) @ (g*span, 7*c). Bucketed
    extents leave stale scratch outside a roi's window; the zero interpolation
    weights there kill it (the host plan forces the first nslots*g rois to the
    full envelope so every band starts NaN-free, as in the per-roi kernel)."""
    fs = refs[:num_levels]
    wyb_ref, wxb_ref, out_ref, win2, sem2 = refs[num_levels:]
    i = pl.program_id(0)
    n = pl.num_programs(0)
    slot = jax.lax.rem(i, nslots)

    def window_dma(step, sl):
        def do(op):
            for j in range(g):
                k = step * g + j
                lvl = lvl_ref[k]
                y0 = pl.multiple_of(y0_ref[k], 8)   # host 8-aligns row starts
                x0c = pl.multiple_of(x0c_ref[k], 128)  # x0*c; c % 128 == 0
                rb = rb_ref[k]
                cb = cb_ref[k]
                for l in range(num_levels):
                    for bi, rh in enumerate(row_buckets):
                        for bj, cw in enumerate(col_buckets):
                            @pl.when((lvl == l) & (rb == bi) & (cb == bj))
                            def _(l=l, rh=rh, cw=cw, j=j):
                                op(pltpu.make_async_copy(
                                    fs[l].at[pl.ds(y0, rh),
                                             pl.ds(x0c, cw * c)],
                                    win2.at[sl, pl.ds(j * rows_env, rh),
                                            pl.ds(0, cw * c)],
                                    sem2.at[sl, j]))
        return do

    @pl.when(i == 0)
    def _():
        for s in range(nslots - 1):
            @pl.when(jnp.asarray(s, jnp.int32) < n)
            def _(s=s):
                window_dma(jnp.asarray(s, jnp.int32),
                           jnp.asarray(s, jnp.int32))(lambda cp: cp.start())

    @pl.when(i + (nslots - 1) < n)
    def _():
        j = i + (nslots - 1)
        window_dma(j, jax.lax.rem(j, nslots))(lambda cp: cp.start())

    window_dma(i, slot)(lambda cp: cp.wait())

    w = win2[slot]                                  # (g*rows_env, span*c)
    wy = wyb_ref[0]                                 # (g*7, g*rows_env)
    wx = wxb_ref[0]                                 # (g*7, g*span)
    if hi_prec:
        w = w.astype(jnp.float32)
        wy = wy.astype(jnp.float32)
        wx = wx.astype(jnp.float32)
        prec = jax.lax.Precision.HIGHEST
    else:
        prec = jax.lax.Precision.DEFAULT
    o = wy.shape[0] // g
    t = jax.lax.dot_general(wy, w, (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32,
                            precision=prec)         # (g*7, span*c)
    # regroup for the x contraction: (g*7, span*c) -> (g*span, 7*c)
    t2 = t.reshape(g, o, span, c).transpose(0, 2, 1, 3).reshape(g * span,
                                                                o * c)
    if not hi_prec:
        t2 = t2.astype(jnp.bfloat16)
    out = jax.lax.dot_general(wx, t2, (((1,), (0,)), ((), ())),
                              preferred_element_type=jnp.float32,
                              precision=prec)       # (g*7_x, 7_y*c)
    out_ref[...] = out.reshape(g, o, o, c).transpose(0, 2, 1, 3)


def _block_diag(w, g):
    """(R, o, win) per-roi weights -> (R/g, g*o, g*win) block-diagonal."""
    r, o, win = w.shape
    eye = jnp.eye(g, dtype=w.dtype)
    blk = jnp.einsum("sjab,jk->sjakb", w.reshape(r // g, g, o, win), eye)
    return blk.reshape(r // g, g * o, g * win)


def _plan_grouped(feats, rois, spatial_scales, output_size: int,
                  sampling_ratio: int, span: int, g: int, nslots: int):
    """Grouped-forward prolog: flat 2D levels, 8-aligned row starts,
    lane-granular col starts, 3x3 size buckets, block-diagonal weights."""
    import math

    rows_env = _GROUP_ROWS_ENV
    row_buckets = _GROUP_ROW_BUCKETS
    col_buckets = (16, 32, span)
    c = feats[0].shape[-1]
    s = output_size * sampling_ratio
    k_min = int(round(-math.log2(spatial_scales[0])))
    k_max = int(round(-math.log2(spatial_scales[-1])))
    levels = jnp.clip(fpn_level_assignment(rois, k_min=k_min, k_max=k_max),
                      0, len(feats) - 1)

    hs = jnp.asarray([f.shape[0] for f in feats], jnp.float32)
    ws = jnp.asarray([f.shape[1] for f in feats], jnp.float32)
    pad8 = lambda v: -(-v // 8) * 8
    padded = [jnp.pad(f, ((0, max(pad8(f.shape[0]), rows_env) - f.shape[0]),
                          (0, max(f.shape[1], span) - f.shape[1]), (0, 0)))
              for f in feats]
    # flat layout: W and C merge into the lane dim, so windows arrive in VMEM
    # already shaped for the y-contraction and col starts are lane-granular
    flat = [p.reshape(p.shape[0], p.shape[1] * c) for p in padded]
    hs_pad = jnp.asarray([p.shape[0] for p in padded], jnp.float32)
    ws_pad = jnp.asarray([p.shape[1] for p in padded], jnp.float32)
    scale = jnp.asarray(list(spatial_scales), jnp.float32)[levels]
    h_l = hs[levels]
    w_l = ws[levels]

    x1 = rois[:, 0] * scale
    y1 = rois[:, 1] * scale
    roi_w = jnp.maximum(rois[:, 2] * scale - x1, 1.0)
    roi_h = jnp.maximum(rois[:, 3] * scale - y1, 1.0)
    steps = (jnp.arange(s, dtype=jnp.float32) + 0.5) / sampling_ratio
    ys = y1[:, None] + steps[None] * (roi_h / output_size)[:, None]
    xs = x1[:, None] + steps[None] * (roi_w / output_size)[:, None]
    in_y = (ys >= -1.0) & (ys <= h_l[:, None])
    in_x = (xs >= -1.0) & (xs <= w_l[:, None])
    y = jnp.clip(ys, 0.0, h_l[:, None] - 1.0)
    x = jnp.clip(xs, 0.0, w_l[:, None] - 1.0)

    y0a = (jnp.floor(y[:, 0]) // 8) * 8             # rows are the sublane dim
    x0a = jnp.floor(x[:, 0])                        # lane-granular
    need_r = jnp.floor(y[:, -1]) + 2.0 - y0a
    need_c = jnp.floor(x[:, -1]) + 2.0 - x0a
    rb = _bucketize(need_r, row_buckets)
    cb = _bucketize(need_c, col_buckets)
    # first nslots*g rois initialize every (slot, band) scratch region with a
    # full-envelope DMA (stale-VMEM NaN guard, as in the per-roi kernel)
    init_n = nslots * g
    rb = jnp.where(jnp.arange(rb.shape[0]) < init_n, len(row_buckets) - 1, rb)
    cb = jnp.where(jnp.arange(cb.shape[0]) < init_n, len(col_buckets) - 1, cb)
    rh = jnp.asarray(row_buckets, jnp.float32)[rb]
    cw = jnp.asarray(col_buckets, jnp.float32)[cb]
    # clamps keep the bucket window inside the padded level; hs_pad and the
    # row buckets are multiples of 8, so row starts stay 8-aligned
    yw0 = jnp.clip(y0a, 0, jnp.maximum(hs_pad[levels] - rh, 0)).astype(jnp.int32)
    xw0 = jnp.clip(x0a, 0, jnp.maximum(ws_pad[levels] - cw, 0)).astype(jnp.int32)

    wy = _axis_weights(y, yw0, h_l, in_y, rows_env, output_size,
                       sampling_ratio, jnp.float32)
    wx = _axis_weights(x, xw0, w_l, in_x, span, output_size, sampling_ratio,
                       jnp.float32)

    r = rois.shape[0]
    r_pad = -(-r // g) * g
    if r_pad != r:
        pad = r_pad - r
        levels = jnp.pad(levels, (0, pad))
        yw0 = jnp.pad(yw0, (0, pad))
        xw0 = jnp.pad(xw0, (0, pad))
        rb = jnp.pad(rb, (0, pad))                  # smallest bucket; zero
        cb = jnp.pad(cb, (0, pad))                  # weights null the output
        wy = jnp.pad(wy, ((0, pad), (0, 0), (0, 0)))
        wx = jnp.pad(wx, ((0, pad), (0, 0), (0, 0)))

    wdt = jnp.float32 if _group_hi_prec() else jnp.bfloat16
    wy_blk = _block_diag(wy.astype(wdt), g)
    wx_blk = _block_diag(wx.astype(wdt), g)
    return (flat, levels.astype(jnp.int32), yw0, xw0 * c, rb, cb,
            wy_blk, wx_blk, rows_env, row_buckets, col_buckets)


def _fwd_call_grouped(feats, rois, spatial_scales, output_size: int,
                      sampling_ratio: int, span: int):
    g = _group()
    nslots = 2
    (flat, levels, y0, x0c, rb, cb, wy_blk, wx_blk, rows_env, row_buckets,
     col_buckets) = _plan_grouped(feats, rois, spatial_scales, output_size,
                                  sampling_ratio, span, g, nslots)
    c = feats[0].shape[-1]
    n_steps = wy_blk.shape[0]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=5,
        grid=(n_steps,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY) for _ in flat]
        + [pl.BlockSpec((1, g * output_size, g * rows_env),
                        lambda i, *_: (i, 0, 0)),
           pl.BlockSpec((1, g * output_size, g * span),
                        lambda i, *_: (i, 0, 0))],
        out_specs=pl.BlockSpec((g, output_size, output_size, c),
                               lambda i, *_: (i, 0, 0, 0)),
        scratch_shapes=[pltpu.VMEM((nslots, g * rows_env, span * c),
                                   flat[0].dtype),
                        pltpu.SemaphoreType.DMA((nslots, g))],
    )
    out = pl.pallas_call(
        functools.partial(_roi_group_kernel, num_levels=len(flat), c=c, g=g,
                          rows_env=rows_env, span=span,
                          row_buckets=row_buckets, col_buckets=col_buckets,
                          nslots=nslots, hi_prec=_group_hi_prec()),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(
            (n_steps * g, output_size, output_size, c), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(levels, y0, x0c, rb, cb, *flat, wy_blk, wx_blk)
    return out[:rois.shape[0]]


def _roi_bwd_kernel(lvl_ref, y0_ref, x0_ref, rb_ref, cb_ref, *refs,
                    num_levels: int, c: int, win_h: int, span: int,
                    row_buckets: tuple, col_buckets: tuple):
    """Transpose of _roi_kernel: gwin = wy^T @ gout @ wx, accumulated into the
    aliased zero-initialized gradient buffers with a read-add-write window DMA
    pair over the roi's bucket extent (gwin is zero beyond it). Grid steps are
    sequential on the TPU core, so overlapping windows accumulate without
    races."""
    g_ref, wy_ref, wx_ref = refs[num_levels:num_levels + 3]
    outs = refs[num_levels + 3:num_levels + 3 + num_levels]
    win, sem = refs[-2:]
    i = pl.program_id(0)
    lvl = lvl_ref[i]
    y0 = y0_ref[i]
    x0 = pl.multiple_of(x0_ref[i], 8)
    rb = rb_ref[i]
    cb = cb_ref[i]

    g = g_ref[0].astype(jnp.float32)               # (7, 7, c)
    wy = wy_ref[0].astype(jnp.float32)             # (7, win_h)
    wx = wx_ref[0].astype(jnp.float32)             # (7, span)
    o = wy.shape[0]
    # t[h, (x c)] = sum_y wy[y, h] g[y, x, c]
    t = jax.lax.dot_general(wy, g.reshape(o, o * c), (((0,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32,
                            precision=jax.lax.Precision.HIGHEST)
    t = t.reshape(win_h, o, c)
    # gwin[w, (h c)] = sum_x wx[x, w] t[h, x, c]
    gw = jax.lax.dot_general(wx, t.transpose(1, 0, 2).reshape(o, -1),
                             (((0,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32,
                             precision=jax.lax.Precision.HIGHEST)
    gw = gw.reshape(span, win_h, c).transpose(1, 0, 2)   # (win_h, span, c)

    for l in range(num_levels):
        for bi, rh in enumerate(row_buckets):
            for bj, cs in enumerate(col_buckets):
                @pl.when((lvl == l) & (rb == bi) & (cb == bj))
                def _(l=l, rh=rh, cs=cs):
                    window = outs[l].at[pl.ds(y0, rh), pl.ds(x0, cs), :]
                    part = win.at[pl.ds(0, rh), pl.ds(0, cs), :]
                    rd = pltpu.make_async_copy(window, part, sem)
                    rd.start()
                    rd.wait()
                    win[pl.ds(0, rh), pl.ds(0, cs), :] = (
                        win[pl.ds(0, rh), pl.ds(0, cs), :]
                        + gw[:rh, :cs, :])
                    wr = pltpu.make_async_copy(part, window, sem)
                    wr.start()
                    wr.wait()


def _bwd_call(g, padded_shapes, levels, yw0, xw0, rb, cb, wy, wx, *,
              output_size: int, win_h: int, span: int):
    """Gradient wrt the PADDED per-level features, f32."""
    c = padded_shapes[0][-1]
    r = levels.shape[0]
    num_levels = len(padded_shapes)
    zeros = [jnp.zeros(s, jnp.float32) for s in padded_shapes]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=5,
        grid=(r,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY) for _ in padded_shapes]
        + [pl.BlockSpec((1, output_size, output_size, c),
                        lambda i, *_: (i, 0, 0, 0)),
           pl.BlockSpec((1, output_size, win_h), lambda i, *_: (i, 0, 0)),
           pl.BlockSpec((1, output_size, span), lambda i, *_: (i, 0, 0))],
        out_specs=[pl.BlockSpec(memory_space=pl.ANY)
                   for _ in padded_shapes],
        scratch_shapes=[pltpu.VMEM((win_h, span, c), jnp.float32),
                        pltpu.SemaphoreType.DMA],
    )
    # alias the zero buffers (inputs 5..5+L-1 counting scalar prefetch) to the
    # outputs: each grid step read-modify-writes its roi's window
    return pl.pallas_call(
        functools.partial(_roi_bwd_kernel, num_levels=num_levels, c=c,
                          win_h=win_h, span=span,
                          row_buckets=_buckets(win_h),
                          col_buckets=_buckets(span)),
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct(s, jnp.float32)
                   for s in padded_shapes],
        input_output_aliases={5 + i: i for i in range(num_levels)},
    )(levels, yw0, xw0, rb, cb, *zeros, g, wy, wx)


def _forward(feats, rois, spatial_scales, output_size, sampling_ratio,
             window):
    """Primal forward: grouped kernel when CALD_TPU_ROI_GROUP is set (and the
    roi count justifies a group), per-roi window-DMA kernel otherwise."""
    g = _group()
    if g > 1 and rois.shape[0] >= 2 * 2 * g:   # init trick needs nslots*g rois
        return _fwd_call_grouped(feats, rois, spatial_scales, output_size,
                                 sampling_ratio, window[1])
    padded, levels, yw0, xw0, rb, cb, wy, wx = _plan(
        feats, rois, spatial_scales, output_size, sampling_ratio, *window)
    return _fwd_call(padded, levels, yw0, xw0, rb, cb, wy, wx,
                     output_size=output_size, win_h=window[0], span=window[1])


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5, 6))
def _roi_align_cv(feats, rois, spatial_scales, output_size, sampling_ratio,
                  window, meta):
    del meta
    return _forward(feats, rois, spatial_scales, output_size, sampling_ratio,
                    window)


def _roi_align_cv_fwd(feats, rois, spatial_scales, output_size, sampling_ratio,
                      window, meta):
    del meta
    out = _forward(feats, rois, spatial_scales, output_size, sampling_ratio,
                   window)
    # residuals always come from the standard per-roi plan: the grouped and
    # per-roi forwards compute the same function (fp-level parity), so the
    # scatter-windows backward stays valid for both
    _, levels, yw0, xw0, rb, cb, wy, wx = _plan(
        feats, rois, spatial_scales, output_size, sampling_ratio, *window)
    return out, (levels, yw0, xw0, rb, cb, wy, wx)


def _roi_align_cv_bwd(spatial_scales, output_size, sampling_ratio, window,
                      meta, res, g):
    levels, yw0, xw0, rb, cb, wy, wx = res
    win_h, span = window
    pad_shapes = tuple(
        (max(h, win_h), max(w, span), c) for (h, w, c), _ in meta)
    gpad = _bwd_call(g.astype(jnp.float32), pad_shapes, levels, yw0, xw0,
                     rb, cb, wy, wx, output_size=output_size, win_h=win_h,
                     span=span)
    dfeats = tuple(
        gp[: s[0], : s[1], :].astype(dt)
        for gp, (s, dt) in zip(gpad, meta))
    return dfeats, jnp.zeros((levels.shape[0], 4), jnp.float32)


_roi_align_cv.defvjp(_roi_align_cv_fwd, _roi_align_cv_bwd)


def pallas_multi_scale_roi_align(feats, rois, *, spatial_scales,
                                 output_size: int = 7, sampling_ratio: int = 2,
                                 window: tuple = WIN_INFER):
    """feats: list of (H_l, W_l, C); rois (R, 4). Returns (R, 7, 7, C) f32.
    Differentiable wrt feats (custom_vjp scatter-windows kernel); rois get
    zero cotangents (they are stop_gradient'ed upstream anyway).
    ``window``: the (rows, cols) worst-case DMA envelope — WIN_INFER (44, 48)
    for the scoring path, WIN_TRAIN (48, 56) on the training path (header
    comment). Per-roi DMAs use the smallest size bucket covering the roi."""
    meta = tuple((tuple(f.shape), jnp.dtype(f.dtype).name) for f in feats)
    return _roi_align_cv(tuple(feats), rois, tuple(spatial_scales),
                         output_size, sampling_ratio, tuple(window), meta)
