"""Full-level-matmul multi-scale RoIAlign (the per-roi-copy-free formulation).

TPU-native replacement for torchvision's ``MultiScaleRoIAlign``
(/root/reference/detection/frcnn_la.py:206-209), same sampling semantics as
``ops/roi_align.py`` (aligned=False, sampling_ratio=2, torchvision border
handling) — but with NO per-roi window copies at all.

Why: rounds 3-4 measured a ~3.8 us/roi floor on every windowed formulation —
the per-copy DMA ISSUE cost, bytes-independent and non-pipelining on this
chip (PERF.md). The only way past it is to never copy per roi: express the
separable pooled-bilinear interpolation as matmuls against the ENTIRE level,

    out[j, m, c] = sum_h sum_w Wy[j, h] * Wx[m, w] * X[h, w, c]

where Wy (7, H_l) / Wx (7, W_l) are the per-roi pooled interpolation weights
(the 2x2 sub-sample mean folded in — it commutes with the bilinear weights).
Per roi this is ~19x the FLOPs of a windowed gather at P2, but it is pure MXU
work (~27M MAC/roi at the measured level distribution, experiments/
roi_level_hist.py) with zero scalar-core/DMA involvement.

Kernel shape: rois are sorted by FPN level into g-aligned per-level slot
regions (one XLA argsort; proposals are *data*, so reordering them is free —
the box head is permutation-equivariant and small outputs are gathered back
by ``slot_of_roi``). The grid walks (image, chunk); each chunk is
single-level by construction and runs

    T   = [Wy_1; ...; Wy_g] (g*7, H_l) @ X_l (H_l, W_l*C)      MXU, shared X
    T2  = regroup T -> (g*W_l, 7*C)                            (VMEM relayout)
    out = blockdiag(Wx_1..Wx_g) (g*7, g*W_l) @ T2              MXU

with X_l resident in VMEM across all chunks of the same image (BlockSpec
index constant in the chunk axis -> fetched once per image per level).
Invalid rois (padded proposal slots) all share ONE dead slot; chunks past the
live regions map to a single output block and write zeros once — so the cost
scales with VALID rois only (the windowed kernels pay the per-roi floor for
every slot, valid or not).

Exactness: identical weight construction to ops/pallas_roi_align.py's
``_axis_weights`` with the window = the whole level (no clamp regime at all —
every roi's support is inside its level by construction). bf16 mode matches
the grouped kernel's measured score-parity-neutral configuration; hi_prec
(f32/HIGHEST) is bit-comparable to the XLA points path for tests.

Inference-only (the CALD scoring path, SURVEY §3.2); training keeps the
custom_vjp window kernel in ops/pallas_roi_align.py.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from cald_tpu.ops.roi_align import fpn_level_assignment


def _pooled_axis_weights(pos, n_valid, inside, window: int, out_size: int,
                         sr: int, dtype):
    """Pooled bilinear weights over a full axis of length ``window``.

    pos: (R, S=out_size*sr) sample positions (feature px); n_valid: (R,) the
    level's true extent along this axis; inside: (R, S) border mask.
    Returns (R, out_size, window). Same clamp semantics as the points path:
    positions clip to [0, n_valid-1], the pair base to n_valid-2 so frac may
    hit 1.0 exactly at the boundary.
    """
    r, s = pos.shape
    rel = jnp.clip(pos, 0.0, jnp.maximum(n_valid[:, None] - 1.0, 0.0))
    lo = jnp.clip(jnp.floor(rel), 0.0,
                  jnp.maximum(n_valid[:, None] - 2.0, 0.0))
    frac = rel - lo
    kk = jnp.arange(window, dtype=jnp.float32)[None, None, :]
    w = (jnp.where(kk == lo[:, :, None], (1.0 - frac)[:, :, None], 0.0)
         + jnp.where(kk == lo[:, :, None] + 1.0, frac[:, :, None], 0.0))
    w = jnp.where(inside[:, :, None], w, 0.0)
    return w.reshape(r, out_size, sr, window).mean(axis=2).astype(dtype)


def _slot_plan(lv: jnp.ndarray, valid: jnp.ndarray, num_levels: int, g: int,
               nslot: int):
    """Level-sorted, g-aligned slot layout for one image.

    lv: (N,) level per roi in [0, num_levels); valid: (N,) bool.
    Returns (slot_of_roi (N,), roi_of_slot (nslot,), slot_valid (nslot,),
    chunk_lvl (nslot/g,), dead_chunk ()) — all int32/bool.

    Level l's rois occupy slots [A_l, A_l + cnt_l) with A_l a multiple of g
    (regions padded up), so every chunk of g slots is single-level. All
    invalid rois share the single slot A_L (the first dead slot); chunks at or
    past A_L/g are 'dead' (level id == num_levels) and the kernel writes them
    as one zero block.
    """
    n = lv.shape[0]
    lvx = jnp.where(valid, lv, num_levels)                       # (N,) 0..L
    order = jnp.argsort(lvx, stable=True)
    sorted_lv = lvx[order]
    cnt = jnp.sum(jax.nn.one_hot(lvx, num_levels + 1, dtype=jnp.int32), axis=0)
    cap = ((cnt[:num_levels] + g - 1) // g) * g                  # (L,)
    a = jnp.concatenate([jnp.zeros((1,), jnp.int32),
                         jnp.cumsum(cap)])                       # (L+1,)
    cum = jnp.concatenate([jnp.zeros((1,), jnp.int32),
                           jnp.cumsum(cnt)])                     # (L+2,)
    rank_sorted = jnp.arange(n, dtype=jnp.int32) - cum[sorted_lv]
    slot_sorted = jnp.where(sorted_lv == num_levels, a[num_levels],
                            a[sorted_lv] + rank_sorted)          # (N,)
    slot_of_roi = jnp.zeros((n,), jnp.int32).at[order].set(slot_sorted)
    roi_of_slot = jnp.full((nslot,), n, jnp.int32).at[slot_sorted].set(order)
    slot_valid = jnp.zeros((nslot,), bool).at[slot_sorted].set(valid[order])
    nchunk = nslot // g
    # chunk level: the region containing slot k*g (searchsorted over the
    # ascending region ends skips empty levels); >= a[L] -> dead (== L)
    kg = jnp.arange(nchunk, dtype=jnp.int32) * g
    chunk_lvl = jnp.searchsorted(a[1:], kg, side="right").astype(jnp.int32)
    dead_chunk = (a[num_levels] // g).astype(jnp.int32)
    return slot_of_roi, roi_of_slot, slot_valid, chunk_lvl, dead_chunk


def _flm_kernel(lvl_ref, dead_ref, *refs, num_levels: int, c: int, g: int,
                level_hw: tuple, out_size: int, hi_prec: bool, wtile: int):
    """One chunk of g same-level rois: two MXU contractions vs the resident
    level. Dead chunks (level id == num_levels) write one zero block."""
    del dead_ref
    xs = refs[:num_levels]
    wy_ref, wx_ref, out_ref = refs[num_levels:]
    b = pl.program_id(0)
    k = pl.program_id(1)
    l = lvl_ref[b, k]

    @pl.when(l == num_levels)
    def _():
        out_ref[...] = jnp.zeros(out_ref.shape, out_ref.dtype)

    for lv, (h_l, w_l) in enumerate(level_hw):
        @pl.when(l == lv)
        def _(lv=lv, h_l=h_l, w_l=w_l):
            x = xs[lv][0]                                # (H_l, W_l*C)
            wy = wy_ref[0, 0][:, :h_l]                   # (g*7, H_l)
            wx = wx_ref[0, 0][:, :, :w_l]                # (g, 7, W_l)
            if hi_prec:
                x = x.astype(jnp.float32)
                wy = wy.astype(jnp.float32)
                wx = wx.astype(jnp.float32)
                prec = jax.lax.Precision.HIGHEST
            else:
                prec = jax.lax.Precision.DEFAULT
            t = jax.lax.dot_general(wy, x, (((1,), (0,)), ((), ())),
                                    preferred_element_type=jnp.float32,
                                    precision=prec)      # (g*7, W_l*C)
            # x contraction, W-TILED: the (g,7,W,C)->(g,W,7,C) regroup is the
            # Mosaic compile cliff at full width (the round-4 grouped kernel's
            # identical transpose already failed to compile at g=8, span 56 —
            # PERF.md), so it runs in W-tiles of `wt` columns, each tile a
            # small transpose + one block-diagonal dot accumulated into out.
            # largest divisor of w_l <= wtile: full-width fallback would
            # re-open the Mosaic compile cliff on canvases whose level
            # widths aren't 2^k (COCO 1344 -> 336/168/84/42 all tile at 28/21).
            # A degenerate divisor (< 8, e.g. prime widths) would unroll the
            # loop into w_l/wt tiny transposes — worse than the cliff; no
            # real canvas has one (strides are 4..32 over 32-multiple
            # canvases), so take the single-tile path there instead.
            wt = max(d for d in range(1, min(w_l, wtile) + 1) if w_l % d == 0)
            if wt < 8:
                wt = w_l
            acc = None
            for ti in range(w_l // wt):
                tt = t[:, ti * wt * c:(ti + 1) * wt * c]  # (g*7, wt*C)
                t2 = tt.reshape(g, out_size, wt, c).transpose(0, 2, 1, 3)
                t2 = t2.reshape(g * wt, out_size * c)
                if not hi_prec:
                    t2 = t2.astype(x.dtype)
                # block-diag x-weight tile: row block j holds roi j's
                # (7, wt) slice at column offset j*wt (jnp.pad: zero-width
                # pads are no-ops, dodging Mosaic's zero-sized-vector reject)
                wxt = wx[:, :, ti * wt:(ti + 1) * wt]
                rows = [jnp.pad(wxt[j], ((0, 0), (j * wt, (g - 1 - j) * wt)))
                        for j in range(g)]
                wxb = jnp.concatenate(rows, axis=0)      # (g*7, g*wt)
                part = jax.lax.dot_general(
                    wxb, t2, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                    precision=prec)                      # (g*7x, 7y*c)
                acc = part if acc is None else acc + part
            out_ref[...] = acc.reshape(
                1, g, out_size, out_size, c).transpose(
                0, 1, 3, 2, 4).astype(out_ref.dtype)


def flm_multi_scale_roi_align(feats, rois, valid, *, spatial_scales,
                              output_size: int = 7, sampling_ratio: int = 2,
                              group: int | None = None, wtile: int | None = None,
                              hi_prec: bool = False, interpret: bool = False):
    """Batched full-level-matmul RoIAlign.

    feats: list of (B, H_l, W_l, C) pyramid levels (finest first);
    rois: (B, N, 4) image-space boxes; valid: (B, N) bool.
    Returns (pooled (B, NSLOT, out, out, C) in the feature dtype (float32
    under hi_prec), slot_of_roi (B, N) int32)
    with NSLOT = N rounded up to the slot capacity (N + (L+1)*group). Row
    ``slot_of_roi[b, i]`` of ``pooled[b]`` is roi i's pooled feature; invalid
    rois map to a zero row. Rows not addressed by any roi are unspecified —
    consumers must gather by slot (the box head runs on all slots, outputs
    are gathered back; garbage rows never mix across rows).
    """
    import os

    num_levels = len(feats)
    b, n = rois.shape[:2]
    c = feats[0].shape[-1]
    g = group if group is not None else int(
        os.environ.get("CALD_TPU_FLM_G", "4"))
    wtile = wtile if wtile is not None else int(
        os.environ.get("CALD_TPU_FLM_WT", "32"))
    s = output_size * sampling_ratio
    k_min = int(round(-math.log2(spatial_scales[0])))
    k_max = int(round(-math.log2(spatial_scales[-1])))
    level_hw = tuple((f.shape[1], f.shape[2]) for f in feats)
    h_max = max(h for h, _ in level_hw)
    w_max = max(w for _, w in level_hw)
    nslot = ((n + g - 1) // g) * g + (num_levels + 1) * g
    nchunk = nslot // g

    levels = jax.vmap(lambda r: jnp.clip(
        fpn_level_assignment(r, k_min=k_min, k_max=k_max),
        0, num_levels - 1))(rois)                                 # (B, N)
    plan = jax.vmap(functools.partial(
        _slot_plan, num_levels=num_levels, g=g, nslot=nslot))(levels, valid)
    slot_of_roi, roi_of_slot, slot_valid, chunk_lvl, dead_chunk = plan

    # per-slot roi data (untouched slots read roi 0; weights masked below)
    take = lambda t: jnp.take_along_axis(
        t, jnp.clip(roi_of_slot, 0, n - 1)[..., None], axis=1)
    rois_s = take(rois)                                           # (B, NSLOT, 4)
    lv_s = jnp.take_along_axis(levels, jnp.clip(roi_of_slot, 0, n - 1), axis=1)

    hs = jnp.asarray([h for h, _ in level_hw], jnp.float32)
    ws = jnp.asarray([w for _, w in level_hw], jnp.float32)
    scales = jnp.asarray(list(spatial_scales), jnp.float32)
    scale = scales[lv_s]                                          # (B, NSLOT)
    h_l = hs[lv_s]
    w_l = ws[lv_s]
    x1 = rois_s[..., 0] * scale
    y1 = rois_s[..., 1] * scale
    roi_w = jnp.maximum(rois_s[..., 2] * scale - x1, 1.0)
    roi_h = jnp.maximum(rois_s[..., 3] * scale - y1, 1.0)
    steps = (jnp.arange(s, dtype=jnp.float32) + 0.5) / sampling_ratio
    ys = y1[..., None] + steps * (roi_h / output_size)[..., None]  # (B,NSLOT,S)
    xs = x1[..., None] + steps * (roi_w / output_size)[..., None]
    in_y = (ys >= -1.0) & (ys <= h_l[..., None]) & slot_valid[..., None]
    in_x = (xs >= -1.0) & (xs <= w_l[..., None]) & slot_valid[..., None]

    wdt = jnp.float32 if hi_prec else feats[0].dtype
    axis_w = functools.partial(_pooled_axis_weights, out_size=output_size,
                               sr=sampling_ratio, dtype=wdt)
    wy = jax.vmap(lambda p, nv, ins: axis_w(p, nv, ins, window=h_max))(
        ys, h_l, in_y)                                            # (B,NSLOT,7,Hmax)
    wx = jax.vmap(lambda p, nv, ins: axis_w(p, nv, ins, window=w_max))(
        xs, w_l, in_x)                                            # (B,NSLOT,7,Wmax)
    wy = wy.reshape(b, nchunk, g * output_size, h_max)
    wx = wx.reshape(b, nchunk, g, output_size, w_max)

    x2d = [f.reshape(f.shape[0], f.shape[1], -1) for f in feats]  # (B,H,W*C)

    def clampk(dref, bi, k):
        return jnp.minimum(k, dref[bi])

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(b, nchunk),
        in_specs=[pl.BlockSpec((1, h, w * c), lambda bi, k, s_, d_: (bi, 0, 0))
                  for (h, w) in level_hw]
        + [pl.BlockSpec((1, 1, g * output_size, h_max),
                        lambda bi, k, s_, d_: (bi, clampk(d_, bi, k), 0, 0)),
           pl.BlockSpec((1, 1, g, output_size, w_max),
                        lambda bi, k, s_, d_: (bi, clampk(d_, bi, k), 0, 0,
                                               0))],
        out_specs=pl.BlockSpec(
            (1, g, output_size, output_size, c),
            lambda bi, k, s_, d_: (bi, clampk(d_, bi, k), 0, 0, 0)),
    )
    pooled = pl.pallas_call(
        functools.partial(_flm_kernel, num_levels=num_levels, c=c, g=g,
                          level_hw=level_hw, out_size=output_size,
                          hi_prec=hi_prec, wtile=wtile),
        grid_spec=grid_spec,
        # feature dtype (bf16 in the scoring program): the box head casts its
        # input to the compute dtype anyway, and an f32 pooled buffer at
        # scoring batch sizes is ~6.7 GB of HBM (f32 only under hi_prec)
        out_shape=jax.ShapeDtypeStruct(
            (b, nslot, output_size, output_size, c),
            jnp.float32 if hi_prec else feats[0].dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=120 * 1024 * 1024),
        interpret=interpret,
    )(chunk_lvl, dead_chunk, *x2d, wy, wx)
    return pooled, slot_of_roi
