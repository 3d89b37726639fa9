"""Geometric augmentations on fixed-canvas images.

Images are NHWC float arrays on a fixed canvas ``(H, W, 3)`` whose top-left
``(h, w)`` region is valid (the rest is zero padding, torchvision-batch style).
Augmentations therefore transform both the pixels (via inverse-affine bilinear
gathers — static shapes, fully jittable) and the valid size, and map reference
boxes with exactly the coordinate math of /root/reference/cald/cald_helper.py.

All functions take and return ``(image, boxes, valid_hw)`` where valid_hw is an
int32 (2,) array (h, w).
"""

from __future__ import annotations

import math

import jax.numpy as jnp


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


def resize_image_boxes(image: jnp.ndarray, boxes: jnp.ndarray, valid_hw, ratio: float):
    """Scale the valid region by ``ratio`` about the canvas origin; boxes *= ratio
    (cald_helper.py:47-53). ``ratio`` must be static. Requires ratio <= canvas
    headroom when upscaling."""
    ch, cw, _ = image.shape
    ys, xs = _grid((ch, cw))
    # Output valid size: floor like PIL's int(w * ratio).
    nh = jnp.floor(valid_hw[0].astype(jnp.float32) * ratio).astype(jnp.int32)
    nw = jnp.floor(valid_hw[1].astype(jnp.float32) * ratio).astype(jnp.int32)
    # PIL maps output pixel centers by scale = in_size / out_size.
    sy = (ys + 0.5) * (valid_hw[0].astype(jnp.float32) / jnp.maximum(nh, 1)) - 0.5
    sx = (xs + 0.5) * (valid_hw[1].astype(jnp.float32) / jnp.maximum(nw, 1)) - 0.5
    out = _bilinear_gather(image, sy, sx, valid_hw)
    mask = ((ys < nh) & (xs < nw))[..., None]
    out = jnp.where(mask, out, 0.0)
    return out, boxes * ratio, jnp.stack([nh, nw])


def rotate_image_boxes(image: jnp.ndarray, boxes: jnp.ndarray, valid_hw, angle_deg: float):
    """Rotate by ``angle_deg`` with expand=True, then resize back to (h, w) —
    net pixel effect reproduced by one inverse-affine bilinear gather; box corner
    math matches cald_helper.py:135-223 (affine corners -> enclosing box ->
    rescale by the expanded size -> clamp)."""
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

    # Inverse for pixels: output (x_o, y_o) -> expanded coords (x_o*nw/w, y_o*nh/h)
    # -> undo translation -> rotate by -angle.
    ys, xs = _grid((ch, cw))
    xe = xs * (nw / w) - tx
    ye = ys * (nh / h) - ty
    # Inverse of A (rotation): A^-1 = [[alpha, -beta], [beta, alpha]]
    sx = alpha * xe - beta * ye
    sy = beta * xe + alpha * ye
    out = _bilinear_gather(image, sy, sx, valid_hw)
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
