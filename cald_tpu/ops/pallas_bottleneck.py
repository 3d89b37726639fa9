"""Fused ResNet bottleneck stages as Pallas TPU kernels.

Why: a stride-1 bottleneck (1x1 -> 3x3 -> 1x1 + identity, FrozenBN, relu) is
HBM-bound under XLA — every conv round-trips its activation through HBM
(~78 MB per block at 160x256x256xbf16 vs the 42 MB in+out minimum; measured
at the roofline, PERF.md round 2). Here one kernel invocation computes the
WHOLE block with every intermediate resident in VMEM: the 1x1s are plain
matmuls over the channel dim, the 3x3 is nine shifted (TH*TW, P) x (P, P)
matmuls accumulated in f32, and the frozen norms are folded into the conv
weights (scale) and a per-channel bias ahead of time. Tiles are
double-buffered: each grid step prefetches the next tile's window DMA while
computing, so the kernel runs at max(DMA, MXU) instead of their sum.

Chaining trick: blocks in a stage ping-pong between two ring-padded buffers
(interior at row offset 1 / col offset 8, zero halo ring). Each call reads
haloed tiles from one buffer and writes its interior into the other, which is
input_output_aliased from the buffer that went stale two blocks ago — its
zero ring survives untouched, so the next block's halo reads are correct with
ZERO re-padding traffic. Col starts stay 8-aligned (Mosaic W-tile) because
the left pad is 8 and tile widths are multiples of 8.

Inference/scoring path only (the fold needs frozen norms; training uses the
XLA path via the backbone's gate). Supports any (H, W) whose stage dims admit
a tile split with TW % 8 == 0 — else the caller falls back to XLA.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# bound on the buffers accounted for below (double-buffered tiles + weights).
# Mosaic's scoped-vmem accounting adds matmul temporaries on top (~2x
# observed), so this targets roughly half the raised 64 MB kernel limit.
_VMEM_BUDGET = 24 * 1024 * 1024
_VMEM_LIMIT = 64 * 1024 * 1024


def _pick_tiles(h: int, w: int, c: int, p: int, itemsize: int = 2):
    """Largest (TH, TW) with TW % 8 == 0 dividing (h, w) that fits VMEM."""
    ws = [t for t in (256, 128, 64, 32, 16, 8) if w % t == 0]
    hs = [t for t in (64, 40, 32, 20, 16, 10, 8, 5, 4, 2, 1) if h % t == 0]
    for tw in ws:
        for th in hs:
            xt = (th + 2) * (tw + 16) * c * itemsize
            y1 = (th + 2) * (tw + 16) * p * max(itemsize, 4)
            acc = th * tw * p * 4
            out = th * tw * c * max(itemsize, 4)
            wts = (2 * c * p + 9 * p * p) * itemsize
            if 2 * (xt + out) + y1 + acc + wts <= _VMEM_BUDGET:
                return th, tw
    return None


def _block_kernel(src, dst_in, w1, b1, w2, b2, w3, b3, out, xt2, ot2,
                  rsem, wsem, *, th: int, tw: int, c: int, p: int, nh: int,
                  nw: int, h: int, w: int):
    del dst_in
    b = pl.program_id(0)
    i = pl.program_id(1)
    j = pl.program_id(2)
    k = (b * nh + i) * nw + j
    n = pl.num_programs(0) * nh * nw
    slot = jax.lax.rem(k, 2)

    def coords(kk):
        jj = jax.lax.rem(kk, nw)
        bi = jax.lax.div(kk, nw)
        ii = jax.lax.rem(bi, nh)
        bb = jax.lax.div(bi, nh)
        return bb, ii * th, pl.multiple_of(jj * tw, 8)

    def read_cp(kk, sl):
        bb, r0, c0 = coords(kk)
        return pltpu.make_async_copy(
            src.at[bb, pl.ds(r0, th + 2), pl.ds(c0, tw + 16), :],
            xt2.at[sl], rsem.at[sl])

    def write_cp(kk, sl):
        bb, r0, c0 = coords(kk)
        return pltpu.make_async_copy(
            ot2.at[sl], out.at[bb, pl.ds(r0 + 1, th), pl.ds(c0 + 8, tw), :],
            wsem.at[sl])

    @pl.when(k == 0)
    def _():
        read_cp(k, slot).start()

    @pl.when(k + 1 < n)
    def _():
        read_cp(k + 1, 1 - slot).start()

    read_cp(k, slot).wait()

    x = xt2[slot]                                       # (th+2, tw+16, c)
    prec = jax.lax.Precision.DEFAULT
    y1 = jax.lax.dot_general(
        x.reshape(-1, c), w1[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32, precision=prec)
    y1 = jnp.maximum(y1 + b1[:], 0.0).astype(x.dtype)
    y1 = y1.reshape(th + 2, tw + 16, p)
    # Zero-'SAME' semantics: halo positions OUTSIDE the image must contribute
    # 0 to the 3x3 taps, but the zero ring in src yields relu(b1) there after
    # the biased 1x1. Mask them back to zero (in-image padded rows are 1..h,
    # cols 8..w+7; the tile spans padded rows r0..r0+th+1, cols c0..c0+tw+15).
    # (3-D int32 iotas: Mosaic can't minor-dim-broadcast an i1 mask)
    _, r0, c0 = coords(k)
    rows = r0 + jax.lax.broadcasted_iota(jnp.int32, (th + 2, tw + 16, p), 0)
    cols = c0 + jax.lax.broadcasted_iota(jnp.int32, (th + 2, tw + 16, p), 1)
    inimg = (rows >= 1) & (rows <= h) & (cols >= 8) & (cols <= w + 7)
    y1 = jnp.where(inimg, y1, jnp.zeros_like(y1))

    # 3x3 conv as 9 shifted matmuls. (A tap-concat im2col through a scratch
    # ref was measured too: the VMEM materialization cost more than the
    # larger-contraction matmul saved, see PERF.md round 2.)
    acc = jnp.zeros((th * tw, p), jnp.float32)
    for t in range(9):
        dy, dx = divmod(t, 3)
        win = y1[dy: dy + th, 7 + dx: 7 + dx + tw, :].reshape(th * tw, p)
        acc += jax.lax.dot_general(
            win, w2[t], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=prec)
    z = jnp.maximum(acc + b2[:], 0.0).astype(x.dtype)

    o = jax.lax.dot_general(
        z, w3[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32, precision=prec)
    ident = x[1: th + 1, 8: tw + 8, :].reshape(th * tw, c).astype(jnp.float32)
    o = jnp.maximum(o + b3[:] + ident, 0.0)

    # the slot's previous write (step k-2) must land before the buffer reuse
    @pl.when(k >= 2)
    def _():
        write_cp(k - 2, slot).wait()

    ot2[slot] = o.astype(x.dtype).reshape(th, tw, c)
    write_cp(k, slot).start()

    @pl.when(k == n - 1)
    def _():
        write_cp(k, slot).wait()

    @pl.when((k == n - 1) & (n > 1))
    def _():
        write_cp(k - 1, 1 - slot).wait()


def _fused_block(src, dst, w1, b1, w2, b2, w3, b3, *, th: int, tw: int):
    bsz, hp, wp, c = src.shape
    p = w1.shape[1]
    nh, nw = (hp - 2) // th, (wp - 16) // tw
    grid = (bsz, nh, nw)
    full = lambda a: pl.BlockSpec(a.shape, lambda *_: (0,) * a.ndim)
    return pl.pallas_call(
        functools.partial(_block_kernel, th=th, tw=tw, c=c, p=p, nh=nh, nw=nw,
                          h=hp - 2, w=wp - 16),
        grid=grid,
        in_specs=[pl.BlockSpec(memory_space=pl.ANY),
                  pl.BlockSpec(memory_space=pl.ANY),
                  full(w1), full(b1), full(w2), full(b2), full(w3), full(b3)],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        out_shape=jax.ShapeDtypeStruct(src.shape, src.dtype),
        scratch_shapes=[pltpu.VMEM((2, th + 2, tw + 16, c), src.dtype),
                        pltpu.VMEM((2, th, tw, c), src.dtype),
                        pltpu.SemaphoreType.DMA((2,)),
                        pltpu.SemaphoreType.DMA((2,))],
        input_output_aliases={1: 0},
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT),
    )(src, dst, w1, b1, w2, b2, w3, b3)


# --------------- stage-in-one-kernel (deep fusion) ---------------
#
# One kernel invocation computes ALL stride-1 blocks of a stage per tile: the
# tile is read once with a (d, 8)-halo, every inter-block activation lives as
# an SSA value whose rows AND cols shrink by 2 per block (halo consumption),
# and only the final interior is written back — HBM traffic drops from
# 2 passes/block to 2 passes/stage-suffix. No scratch ping-pong, no garbage
# regions: all slices are static and every consumed halo element is real data
# (PERF.md round-2/3 backlog item 3, "stage-in-one-kernel, growing-halo
# tiles"). Col halo is the fixed 8-per-side alignment pad, so d <= 8.


_VMEM_BUDGET_DEEP = 36 * 1024 * 1024
_VMEM_LIMIT_DEEP = 100 * 1024 * 1024


def _pick_tiles_deep(h: int, w: int, c: int, p: int, d: int,
                     itemsize: int = 2):
    """Best-efficiency (TH, TW) dividing (h, w), TW % 8 == 0, whose
    deep-fusion working set (haloed tile x2, f32 accumulators, all d blocks'
    weights) fits the VMEM budget. Efficiency = interior/haloed tile area —
    the fraction of per-block compute that isn't halo overhead."""
    ws = [t for t in (256, 128, 64, 32, 16, 8) if w % t == 0]
    hs = [t for t in (64, 40, 32, 20, 16, 10, 8, 5, 4, 2, 1) if h % t == 0]
    best, best_eff = None, 0.0
    for tw in ws:
        for th in hs:
            hh, wwid = th + 2 * d, tw + 16
            xt = hh * wwid * c * itemsize
            y1 = hh * wwid * p * itemsize
            acc = hh * wwid * p * 4
            oacc = hh * wwid * c * 4
            out = th * tw * c * itemsize
            wts = d * (2 * c * p + 9 * p * p) * itemsize
            if 2 * xt + y1 + acc + oacc + 2 * out + wts > _VMEM_BUDGET_DEEP:
                continue
            eff = (th * tw) / (hh * wwid)
            if eff > best_eff:
                best, best_eff = (th, tw), eff
    return (*best, best_eff) if best else None


def _stage_kernel(src, w1s, b1s, w2s, b2s, w3s, b3s, out, xt2, ot2,
                  rsem, wsem, *, th: int, tw: int, c: int, p: int, nh: int,
                  nw: int, h: int, w: int, d: int):
    b = pl.program_id(0)
    i = pl.program_id(1)
    j = pl.program_id(2)
    k = (b * nh + i) * nw + j
    n = pl.num_programs(0) * nh * nw
    slot = jax.lax.rem(k, 2)

    def coords(kk):
        jj = jax.lax.rem(kk, nw)
        bi = jax.lax.div(kk, nw)
        ii = jax.lax.rem(bi, nh)
        bb = jax.lax.div(bi, nh)
        return bb, ii * th, pl.multiple_of(jj * tw, 8)

    def read_cp(kk, sl):
        bb, r0, c0 = coords(kk)
        return pltpu.make_async_copy(
            src.at[bb, pl.ds(r0, th + 2 * d), pl.ds(c0, tw + 16), :],
            xt2.at[sl], rsem.at[sl])

    def write_cp(kk, sl):
        bb, r0, c0 = coords(kk)
        return pltpu.make_async_copy(
            ot2.at[sl], out.at[bb, pl.ds(r0, th), pl.ds(c0, tw), :],
            wsem.at[sl])

    @pl.when(k == 0)
    def _():
        read_cp(k, slot).start()

    @pl.when(k + 1 < n)
    def _():
        read_cp(k + 1, 1 - slot).start()

    read_cp(k, slot).wait()

    _, r0, c0 = coords(k)
    prec = jax.lax.Precision.DEFAULT
    x = xt2[slot]                                  # (th+2d, tw+16, c)
    for blk in range(d):
        rows = th + 2 * (d - blk)
        width = tw + 16 - 2 * blk
        # x spans padded coords rows [r0+blk, ...), cols [c0+blk, ...)
        y1 = jax.lax.dot_general(
            x.reshape(rows * width, c), w1s[blk], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=prec)
        y1 = jnp.maximum(y1 + b1s[blk], 0.0).astype(x.dtype)
        y1 = y1.reshape(rows, width, p)
        # zero-'SAME' semantics: the biased 1x1 yields relu(b1) outside the
        # image; taps must see 0 there (3-D int32 iotas for Mosaic)
        rr = r0 + blk + jax.lax.broadcasted_iota(jnp.int32, (rows, width, p), 0)
        cc = c0 + blk + jax.lax.broadcasted_iota(jnp.int32, (rows, width, p), 1)
        inimg = (rr >= d) & (rr < d + h) & (cc >= 8) & (cc < 8 + w)
        y1 = jnp.where(inimg, y1, jnp.zeros_like(y1))

        ro, wo = rows - 2, width - 2
        acc = jnp.zeros((ro * wo, p), jnp.float32)
        for t in range(9):
            dy, dx = divmod(t, 3)
            win = y1[dy: dy + ro, dx: dx + wo, :].reshape(ro * wo, p)
            acc = acc + jax.lax.dot_general(
                win, w2s[blk, t], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32, precision=prec)
        z = jnp.maximum(acc + b2s[blk], 0.0).astype(x.dtype)
        o = jax.lax.dot_general(z, w3s[blk], (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32,
                                precision=prec)
        ident = x[1: 1 + ro, 1: 1 + wo, :].reshape(ro * wo, c).astype(jnp.float32)
        o = jnp.maximum(o + b3s[blk] + ident, 0.0)
        x = o.astype(xt2.dtype).reshape(ro, wo, c)

    # x: (th, tw+16-2d, c); the tile interior sits at col offset 8-d
    @pl.when(k >= 2)
    def _():
        write_cp(k - 2, slot).wait()

    ot2[slot] = x[:, 8 - d: 8 - d + tw, :]
    write_cp(k, slot).start()

    @pl.when(k == n - 1)
    def _():
        write_cp(k, slot).wait()

    @pl.when((k == n - 1) & (n > 1))
    def _():
        write_cp(k - 1, 1 - slot).wait()


def _stage_call(x, blocks, th: int, tw: int):
    bsz, h, w, c = x.shape
    p = blocks[0][0].shape[1]
    d = len(blocks)
    dt = x.dtype
    src = jnp.pad(x, ((0, 0), (d, d), (8, 8), (0, 0)))
    w1s = jnp.stack([blk[0] for blk in blocks]).astype(dt)
    b1s = jnp.stack([blk[1].reshape(1, -1) for blk in blocks]).astype(jnp.float32)
    w2s = jnp.stack([blk[2].reshape(9, p, p) for blk in blocks]).astype(dt)
    b2s = jnp.stack([blk[3].reshape(1, -1) for blk in blocks]).astype(jnp.float32)
    w3s = jnp.stack([blk[4] for blk in blocks]).astype(dt)
    b3s = jnp.stack([blk[5].reshape(1, -1) for blk in blocks]).astype(jnp.float32)
    nh, nw = h // th, w // tw
    full = lambda a: pl.BlockSpec(a.shape, lambda *_: (0,) * a.ndim)
    return pl.pallas_call(
        functools.partial(_stage_kernel, th=th, tw=tw, c=c, p=p, nh=nh, nw=nw,
                          h=h, w=w, d=d),
        grid=(bsz, nh, nw),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY),
                  full(w1s), full(b1s), full(w2s), full(b2s), full(w3s),
                  full(b3s)],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        out_shape=jax.ShapeDtypeStruct((bsz, h, w, c), dt),
        scratch_shapes=[pltpu.VMEM((2, th + 2 * d, tw + 16, c), dt),
                        pltpu.VMEM((2, th, tw, c), dt),
                        pltpu.SemaphoreType.DMA((2,)),
                        pltpu.SemaphoreType.DMA((2,))],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT_DEEP),
    )(src, w1s, b1s, w2s, b2s, w3s, b3s)


def maybe_fused_stage_deep(x, blocks):
    """Stage-in-one-kernel variant of ``maybe_fused_stage``: same folded-weight
    tuples, one pallas_call per fusion GROUP. The group size is the largest
    depth (<= 8, the col-halo bound) whose best tiling keeps >= 50% of the
    per-block compute out of the halo — deep stages with fat channels (e.g.
    stage4's 17 MB of weights) automatically split into shallower chained
    groups rather than degrade to sliver tiles. Returns None when no tiling
    exists (caller falls back to the XLA path)."""
    if not blocks:
        return None
    d = len(blocks)
    bsz, h, w, c = x.shape
    p = blocks[0][0].shape[1]
    pick = None
    for g in range(min(d, 8), 0, -1):
        t = _pick_tiles_deep(h, w, c, p, g, itemsize=x.dtype.itemsize)
        if t is not None and (t[2] >= 0.5 or g == 1):
            pick = (g, t[0], t[1])
            break
    if pick is None:
        return None
    g, th, tw = pick
    out = x
    for i in range(0, d, g):
        grp = blocks[i: i + g]
        if len(grp) != g:   # tail group: re-tile for the smaller depth
            th, tw, _ = _pick_tiles_deep(h, w, c, p, len(grp),
                                         itemsize=x.dtype.itemsize)
        out = _stage_call(out, grp, th, tw)
    return out


def fold_frozen(kernel, scale, shift):
    """Fold a per-out-channel frozen-norm (y = conv(x) * scale + shift) into
    the conv kernel; returns (folded_kernel, bias)."""
    return kernel * scale.reshape((1,) * (kernel.ndim - 1) + (-1,)), shift


def maybe_fused_stage(x, blocks):
    """x (B, H, W, C); blocks: list of (w1 (C,P), b1, w2 (3,3,P,P), b2,
    w3 (P,C), b3) folded-weight tuples for the stride-1 identity-shortcut
    suffix of a ResNet stage. Returns the stage output, or None when the
    shapes don't admit a fused tiling (caller falls back to XLA)."""
    if not blocks:
        return None
    bsz, h, w, c = x.shape
    p = blocks[0][0].shape[1]
    tiles = _pick_tiles(h, w, c, p, itemsize=x.dtype.itemsize)
    if tiles is None:
        return None
    th, tw = tiles
    dt = x.dtype
    src = jnp.pad(x, ((0, 0), (1, 1), (8, 8), (0, 0)))
    dst = jnp.zeros_like(src)
    for (w1, b1, w2, b2, w3, b3) in blocks:
        nxt = _fused_block(
            src, dst,
            w1.astype(dt), b1.astype(jnp.float32).reshape(1, -1),
            w2.reshape(9, p, p).astype(dt),
            b2.astype(jnp.float32).reshape(1, -1),
            w3.astype(dt), b3.astype(jnp.float32).reshape(1, -1),
            th=th, tw=tw)
        src, dst = nxt, src
    return src[:, 1: h + 1, 8: w + 8, :]
