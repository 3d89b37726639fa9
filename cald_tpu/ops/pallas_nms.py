"""Greedy NMS suppression as a Pallas TPU kernel.

The tiled XLA formulation (cald_tpu/ops/nms.py) already avoids K x K memory,
but each of its ~K/128 sequential steps is a separate XLA loop iteration whose
operands round-trip through HBM. Here the whole recurrence runs inside ONE
kernel with boxes + the alive mask resident in VMEM (4096 x 4 f32 = 64 KB),
so the sequential tile steps are VPU-only.

Semantics are identical to ``nms._tiled_suppression`` (torchvision greedy NMS
over score-sorted boxes): per tile, kill members overlapped (> threshold) by
surviving earlier boxes, then run the within-tile fixpoint.

The caller (ops.nms) uses this kernel on TPU backends and falls back to the
XLA path elsewhere (CPU tests, interpret mode).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE = 128


def _iou_block(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """(N, 4) x (M, 4) -> (N, M) IoU, clamped semantics; coordinates arrive as
    separate columns to stay in (sublane, lane) friendly layouts."""
    ax1, ay1, ax2, ay2 = a[:, 0:1], a[:, 1:2], a[:, 2:3], a[:, 3:4]
    bx1, by1, bx2, by2 = b[:, 0], b[:, 1], b[:, 2], b[:, 3]
    w = jnp.clip(jnp.minimum(ax2, bx2[None, :]) - jnp.maximum(ax1, bx1[None, :]), 0.0)
    h = jnp.clip(jnp.minimum(ay2, by2[None, :]) - jnp.maximum(ay1, by1[None, :]), 0.0)
    inter = w * h
    area_a = (ax2 - ax1) * (ay2 - ay1)
    area_b = (bx2 - bx1) * (by2 - by1)
    union = area_a + area_b[None, :] - inter
    return jnp.where(union > 0, inter / jnp.maximum(union, 1e-12), 0.0)


def _suppression_kernel(boxes_ref, alive_ref, out_ref, *, iou_threshold: float,
                        k: int, tile: int):
    """boxes_ref: (NT, T, 4); alive_ref/out_ref: (NT, T) — tile-major layouts
    so per-tile access is plain row indexing (Mosaic rejects unaligned dynamic
    slices of 1-D lane-tiled arrays). out_ref doubles as the working mask."""
    out_ref[:] = alive_ref[:]
    nt = k // tile
    boxes = boxes_ref[:].reshape(k, 4)          # (K, 4) resident in VMEM
    tile_row = jax.lax.broadcasted_iota(jnp.int32, (nt, tile), 0)
    row_lt_col = (jax.lax.broadcasted_iota(jnp.int32, (tile, tile), 0)
                  < jax.lax.broadcasted_iota(jnp.int32, (tile, tile), 1))
    tri = row_lt_col.astype(jnp.float32)

    def outer(i, _):
        tile_boxes = boxes_ref[i]                                 # (T, 4)
        tile_alive = out_ref[i]                                   # (T,)
        alive = out_ref[:]                                        # (NT, T)
        # cross-tile: earlier surviving boxes kill tile members
        cross = _iou_block(boxes, tile_boxes).reshape(nt, tile, tile)
        prev = jnp.where(tile_row < i, alive, 0.0)                # (NT, T)
        killed = jnp.max(jnp.where(cross > iou_threshold, prev[:, :, None], 0.0),
                         axis=(0, 1))                             # (T,)
        tile_alive = tile_alive * (1.0 - killed)
        # within-tile greedy fixpoint
        self_iou = _iou_block(tile_boxes, tile_boxes)
        overlap = jnp.where(self_iou > iou_threshold, tri, 0.0)   # (T, T)
        alive_in = tile_alive

        def cond(state):
            a, prev_a, it = state
            return jnp.any(a != prev_a) & (it < tile)

        def body(state):
            a, _, it = state
            kill = jnp.max(overlap * a[:, None], axis=0)
            return alive_in * (1.0 - kill), a, it + 1

        first = alive_in * (1.0 - jnp.max(overlap * alive_in[:, None], axis=0))
        a, _, _ = jax.lax.while_loop(cond, body, (first, alive_in, jnp.int32(0)))
        out_ref[i] = a
        return 0

    jax.lax.fori_loop(0, nt, outer, 0)


@functools.partial(jax.jit, static_argnames=("iou_threshold",))
def pallas_suppression(sboxes: jnp.ndarray, salive: jnp.ndarray,
                       iou_threshold: float) -> jnp.ndarray:
    """Greedy suppression of score-sorted boxes.

    sboxes: (K, 4) f32, K a multiple of 128; salive: (K,) bool.
    Returns the kept mask (K,) bool. Equals nms._tiled_suppression exactly.
    """
    k = sboxes.shape[0]
    nt = k // TILE
    out = pl.pallas_call(
        functools.partial(_suppression_kernel, iou_threshold=iou_threshold,
                          k=k, tile=TILE),
        out_shape=jax.ShapeDtypeStruct((nt, TILE), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(sboxes.astype(jnp.float32).reshape(nt, TILE, 4),
      salive.astype(jnp.float32).reshape(nt, TILE))
    return out.reshape(k) > 0.5
