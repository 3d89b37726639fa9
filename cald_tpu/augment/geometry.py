"""Geometric augmentations on fixed-canvas images.

Images are NHWC float arrays on a fixed canvas ``(H, W, 3)`` whose top-left
``(h, w)`` region is valid (the rest is zero padding, torchvision-batch style).
Augmentations transform both the pixels and the valid size, and map reference
boxes with exactly the coordinate math of /root/reference/cald/cald_helper.py.

TPU formulation: per-pixel bilinear gathers on (H, W, 3) images waste ~40x of
gather bandwidth (3 floats per 128-lane vector) and dominated the CALD scoring
program. Resize and rotation are therefore SEPARABLE here:
  - axis scaling = a banded interpolation matrix on the MXU (one matmul per
    axis),
  - per-row/column fractional translation (the shear component of rotation) =
    two contiguous dynamic slices + a lerp.
Rotation decomposes as scale+translate along x then along y (Catmull-Smith
two-pass); pixels interpolate twice (1-D each pass) instead of once (2-D), a
documented deviation from PIL's direct bilinear — box math is unchanged and
exact.

All functions take and return ``(image, boxes, valid_hw)`` where valid_hw is an
int32 (2,) array (h, w).
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

_SHEAR_PAD = 128   # max |fractional translate| supported by the padded slices


def _grid(canvas_hw):
    ch, cw = canvas_hw
    ys = jnp.arange(ch, dtype=jnp.float32)[:, None]
    xs = jnp.arange(cw, dtype=jnp.float32)[None, :]
    return ys, xs


def _bilinear_gather(image: jnp.ndarray, sy: jnp.ndarray, sx: jnp.ndarray,
                     valid_hw) -> jnp.ndarray:
    """Sample image at float source coords (sy, sx), zero outside the valid region.

    image: (H, W, C); sy/sx: (H, W) source coordinates (pixel centers at integers).
    """
    h = valid_hw[0].astype(jnp.float32)
    w = valid_hw[1].astype(jnp.float32)
    inside = (sy >= 0) & (sy <= h - 1) & (sx >= 0) & (sx <= w - 1)
    sy = jnp.clip(sy, 0.0, h - 1)
    sx = jnp.clip(sx, 0.0, w - 1)
    y0 = jnp.floor(sy).astype(jnp.int32)
    x0 = jnp.floor(sx).astype(jnp.int32)
    y1 = jnp.minimum(y0 + 1, (valid_hw[0] - 1).astype(jnp.int32))
    x1 = jnp.minimum(x0 + 1, (valid_hw[1] - 1).astype(jnp.int32))
    ly = (sy - y0)[..., None]
    lx = (sx - x0)[..., None]
    out = (image[y0, x0] * (1 - ly) * (1 - lx) + image[y0, x1] * (1 - ly) * lx
           + image[y1, x0] * ly * (1 - lx) + image[y1, x1] * ly * lx)
    return jnp.where(inside[..., None], out, 0.0)


def horizontal_flip(image: jnp.ndarray, boxes: jnp.ndarray, valid_hw):
    """Flip the valid region left-right; boxes x1' = w - x2, x2' = w - x1
    (cald_helper.py:23-30)."""
    _, cw, _ = image.shape
    w = valid_hw[1]
    xs = jnp.arange(cw, dtype=jnp.int32)[None, :]
    src_x = jnp.where(xs < w, w - 1 - xs, xs)
    flipped = jnp.take_along_axis(image, src_x[..., None], axis=1)
    wf = w.astype(boxes.dtype)
    new_boxes = jnp.stack([wf - boxes[..., 2], boxes[..., 1],
                           wf - boxes[..., 0], boxes[..., 3]], axis=-1)
    return flipped, new_boxes, valid_hw


def _interp_matrix(canvas_out: int, n_out, n_in, canvas_in: int,
                   pil_centers: bool = True) -> jnp.ndarray:
    """(canvas_out, canvas_in) banded 1-D bilinear interpolation matrix.

    Row i holds the two weights sampling source position
      (i + 0.5) * n_in/n_out - 0.5   (PIL pixel-center convention), or
      i * n_in/n_out                 (direct coordinate scaling).
    Rows >= n_out and columns >= n_in are zero. n_out/n_in may be traced.
    """
    i = jnp.arange(canvas_out, dtype=jnp.float32)
    n_in = jnp.asarray(n_in, jnp.float32)
    n_out_f = jnp.maximum(jnp.asarray(n_out, jnp.float32), 1.0)
    if pil_centers:
        src = (i + 0.5) * (n_in / n_out_f) - 0.5
    else:
        src = i * (n_in / n_out_f)
    src = jnp.clip(src, 0.0, n_in - 1.0)
    lo = jnp.clip(jnp.floor(src), 0.0, jnp.maximum(n_in - 2.0, 0.0))
    frac = src - lo
    cols = jnp.arange(canvas_in, dtype=jnp.float32)[None, :]
    m = (jnp.where(cols == lo[:, None], 1.0 - frac[:, None], 0.0)
         + jnp.where(cols == lo[:, None] + 1.0, frac[:, None], 0.0))
    m = jnp.where((jnp.arange(canvas_out) < n_out)[:, None], m, 0.0)
    return jnp.where(cols < n_in, m, 0.0)


def _scale_rows(image: jnp.ndarray, m: jnp.ndarray) -> jnp.ndarray:
    """Apply a (H_out, H_in) interpolation matrix along axis 0 (one matmul)."""
    h, w, c = image.shape
    out = m @ image.reshape(h, w * c)
    return out.reshape(m.shape[0], w, c)


def _translate_rows(image: jnp.ndarray, shifts: jnp.ndarray) -> jnp.ndarray:
    """out[v, x] = image[v, x + shifts[v]] with zeros outside — the shear
    component: per-row fractional translation as two contiguous slices + lerp."""
    h, w, c = image.shape
    pad = _SHEAR_PAD
    padded = jnp.pad(image, ((0, 0), (pad, pad), (0, 0)))
    k = jnp.clip(jnp.floor(shifts), -pad, pad - 1)
    r = (shifts - k)[:, None, None].astype(image.dtype)
    k = k.astype(jnp.int32)

    def row_fn(row, kk):
        lo = jax.lax.dynamic_slice(row, (pad + kk, 0), (w, c))
        hi = jax.lax.dynamic_slice(row, (pad + kk + 1, 0), (w, c))
        return lo, hi

    lo, hi = jax.vmap(row_fn)(padded, k)
    return lo * (1.0 - r) + hi * r


def _translate_grouped(image: jnp.ndarray, shifts: jnp.ndarray, *, axis: int,
                       taps: int, group: int = 16) -> jnp.ndarray:
    """Per-line fractional translation along ``axis`` (1: each row v shifts by
    shifts[v] in x; 0: each column x shifts by shifts[x] in y).

    Grouped-block formulation (the per-row dynamic-slice version cost ~6 ms per
    640x1024 image — 640 tiny gathers; PERF.md round 2): lines are processed in
    groups of ``group``, each group takes ONE dynamic slice at its minimum
    integer shift and the per-line residual r = shift - k_group is applied with
    ``taps`` static sub-slices weighted by the bilinear hat max(0, 1 - |r - t|)
    — EXACTLY two nonzero weights per line, identical arithmetic to the 2-tap
    lerp. Caller guarantees r < taps - 1, i.e.
    taps >= ceil(group * max|d shift / d line|) + 2.
    """
    h, w, c = image.shape
    n_lines = image.shape[0] if axis == 1 else image.shape[1]
    if n_lines % group:
        if axis == 0:
            t = _translate_rows(image.transpose(1, 0, 2), shifts)
            return t.transpose(1, 0, 2)
        return _translate_rows(image, shifts)
    pad = _SHEAR_PAD
    ng = n_lines // group
    k = jnp.clip(jnp.floor(shifts.reshape(ng, group).min(axis=1)),
                 -pad, pad - taps).astype(jnp.int32)                # (ng,)
    r = shifts - jnp.repeat(k, group).astype(shifts.dtype)          # (n_lines,)
    gi = jnp.arange(ng, dtype=jnp.int32)

    if axis == 1:  # rows shift along x
        padded = jnp.pad(image, ((0, 0), (pad, pad), (0, 0)))
        blocks = jax.vmap(lambda g, kk: jax.lax.dynamic_slice(
            padded, (g * group, pad + kk, 0), (group, w + taps, c)))(gi, k)
        blocks = blocks.reshape(h, w + taps, c)
        wt = [jnp.clip(1.0 - jnp.abs(r - t), 0.0, 1.0).astype(image.dtype)
              [:, None, None] for t in range(taps)]
        out = sum(blocks[:, t:t + w, :] * wt[t] for t in range(taps))
    else:  # columns shift along y
        padded = jnp.pad(image, ((pad, pad), (0, 0), (0, 0)))
        blocks = jax.vmap(lambda g, kk: jax.lax.dynamic_slice(
            padded, (pad + kk, g * group, 0), (h + taps, group, c)))(gi, k)
        # (ng, h+taps, group, c) -> (h+taps, w, c)
        blocks = blocks.transpose(1, 0, 2, 3).reshape(h + taps, w, c)
        wt = [jnp.clip(1.0 - jnp.abs(r - t), 0.0, 1.0).astype(image.dtype)
              [None, :, None] for t in range(taps)]
        out = sum(blocks[t:t + h, :, :] * wt[t] for t in range(taps))
    return out


def resize_image_boxes(image: jnp.ndarray, boxes: jnp.ndarray, valid_hw, ratio: float):
    """Scale the valid region by ``ratio`` about the canvas origin; boxes *= ratio
    (cald_helper.py:47-53). ``ratio`` must be static. Requires ratio <= canvas
    headroom when upscaling. Pixels via one interpolation matmul per axis."""
    ch, cw, _ = image.shape
    h = valid_hw[0].astype(jnp.float32)
    w = valid_hw[1].astype(jnp.float32)
    # Output valid size: floor like PIL's int(w * ratio).
    nh = jnp.floor(h * ratio).astype(jnp.int32)
    nw = jnp.floor(w * ratio).astype(jnp.int32)
    my = _interp_matrix(ch, nh, h, ch).astype(image.dtype)
    mx = _interp_matrix(cw, nw, w, cw).astype(image.dtype)
    out = _scale_rows(image, my)
    out = _scale_rows(out.transpose(1, 0, 2), mx).transpose(1, 0, 2)
    return out, boxes * ratio, jnp.stack([nh, nw])


def _affine_1d_matrix(canvas: int, scale, n_in) -> jnp.ndarray:
    """(canvas, canvas) matrix sampling src = scale * i along one axis; weights
    zero outside [0, n_in - 1] (black border, matching expand=True rotation)."""
    i = jnp.arange(canvas, dtype=jnp.float32)
    src = scale * i
    n_in = jnp.asarray(n_in, jnp.float32)
    ok = (src >= 0.0) & (src <= n_in - 1.0)
    srcc = jnp.clip(src, 0.0, jnp.maximum(n_in - 2.0, 0.0))
    lo = jnp.floor(srcc)
    frac = srcc - lo
    cols = jnp.arange(canvas, dtype=jnp.float32)[None, :]
    m = (jnp.where(cols == lo[:, None], 1.0 - frac[:, None], 0.0)
         + jnp.where(cols == lo[:, None] + 1.0, frac[:, None], 0.0))
    m = jnp.where(ok[:, None], m, 0.0)
    return jnp.where(cols < n_in, m, 0.0)


def rotate_image_boxes(image: jnp.ndarray, boxes: jnp.ndarray, valid_hw, angle_deg: float):
    """Rotate by ``angle_deg`` with expand=True, then resize back to (h, w).

    Box corner math matches cald_helper.py:135-223 exactly (affine corners ->
    enclosing box -> rescale by the expanded size -> clamp). Pixels use the
    two-pass separable scheme (see module docstring): the net inverse affine
      src_x = m00*x + m01*y + c0,  src_y = m10*x + m11*y + c1
    factors into a horizontal scale+per-row-translate followed by a vertical
    scale+per-column-translate (valid while m11 != 0, i.e. |angle| < 90deg).
    """
    ch, cw, _ = image.shape
    h = valid_hw[0].astype(jnp.float32)
    w = valid_hw[1].astype(jnp.float32)
    ang = math.radians(angle_deg)
    alpha = math.cos(ang)
    beta = math.sin(ang)
    cx = w / 2
    cy = h / 2
    # Expanded size (reference truncates with int()).
    nw = jnp.floor(h * abs(beta) + w * abs(alpha))
    nh = jnp.floor(h * abs(alpha) + w * abs(beta))

    # Forward map (image coords, y down):  p' = A p + t, then scale (nw,nh)->(w,h).
    # A = [[alpha, beta], [-beta, alpha]];  t = ((1-a)cx - b*cy + nw/2 - cx,
    #                                            b*cx + (1-a)cy + nh/2 - cy)
    tx = (1 - alpha) * cx - beta * cy + nw / 2 - cx
    ty = beta * cx + (1 - alpha) * cy + nh / 2 - cy

    # Inverse affine coefficients (see the gather formulation in git history):
    sxs = nw / w
    sys_ = nh / h
    m00 = alpha * sxs
    m01 = -beta * sys_
    c0 = beta * ty - alpha * tx
    m10 = beta * sxs
    m11 = alpha * sys_
    c1 = -(beta * tx + alpha * ty)

    if angle_deg == 0.0:
        out = image
    else:
        # static tap bound: per-line shift slope is <= tan|ang| (pass 1,
        # exactly -tan*alpha/sxs) and <= tan|ang| * sxs/sys (pass 2); the 1.5
        # margin covers the expand-ratio factor for |ang| well past 45 deg.
        taps = int(math.ceil(
            16 * math.tan(abs(math.radians(angle_deg))) * 1.5)) + 2
        # pass 1 (x): T[v, x] = I[v, a1*x + b1(v)]
        a1 = m00 - m01 * m10 / m11
        rows = jnp.arange(ch, dtype=jnp.float32)
        b1 = (m01 / m11) * rows + (c0 - m01 * c1 / m11)
        mx = _affine_1d_matrix(cw, a1, w).astype(image.dtype)
        t = jnp.einsum("Xx,hxc->hXc", mx, image)
        t = _translate_grouped(t, b1 / a1, axis=1, taps=taps)
        # pass 2 (y): O[y, x] = T[m11*y + b2(x), x]
        cols = jnp.arange(cw, dtype=jnp.float32)
        b2 = m10 * cols + c1
        my = _affine_1d_matrix(ch, m11, h).astype(image.dtype)
        t = jnp.einsum("Yy,yxc->Yxc", my, t)
        out = _translate_grouped(t, b2 / m11, axis=0, taps=taps)

    ys, xs = _grid((ch, cw))
    mask = ((ys < h) & (xs < w))[..., None]
    out = jnp.where(mask, out, 0.0)

    # Boxes: rotate the 4 corners, take the enclosing box, rescale, clamp.
    x1, y1, x2, y2 = boxes[..., 0], boxes[..., 1], boxes[..., 2], boxes[..., 3]
    cxs = jnp.stack([x1, x2, x1, x2], axis=-1)  # (K, 4corners)
    cys = jnp.stack([y1, y1, y2, y2], axis=-1)
    rx = alpha * cxs + beta * cys + tx
    ry = -beta * cxs + alpha * cys + ty
    nx1 = jnp.min(rx, axis=-1)
    ny1 = jnp.min(ry, axis=-1)
    nx2 = jnp.max(rx, axis=-1)
    ny2 = jnp.max(ry, axis=-1)
    scale_x = nw / w
    scale_y = nh / h
    nx1 = jnp.clip(nx1 / scale_x, 0.0, w)
    nx2 = jnp.clip(nx2 / scale_x, 0.0, w)
    ny1 = jnp.clip(ny1 / scale_y, 0.0, h)
    ny2 = jnp.clip(ny2 / scale_y, 0.0, h)
    return out, jnp.stack([nx1, ny1, nx2, ny2], axis=-1), valid_hw
