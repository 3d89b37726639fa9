"""Cutout with box-overlap rejection, under jit with fixed trip counts.

Reference behaviour (/root/reference/cald/cald_helper.py:88-132): up to 50
attempts; each draws a rectangle sized U(0.05, 0.2) of each valid dimension at a
uniform position; the attempt is REJECTED when max_j(intersection(cut, box_j) /
area(box_j)) > 0.4 or < 0.1; accepted rectangles (up to ``cut_num``) are filled
with ``fill_val``. Boxes are unchanged.

The acceptance scan only needs box math, so we run the 50-attempt rejection loop
first (cheap, K boxes per attempt) collecting up to ``cut_num`` rectangles, then
paint them with ``cut_num`` masked fills — instead of 50 full-canvas updates.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


@partial(jax.jit, static_argnames=("cut_num", "attempts"))
def cutout(image: jnp.ndarray, boxes: jnp.ndarray, box_valid: jnp.ndarray,
           valid_hw, key: jax.Array, *, cut_num: int = 2, fill_val: float = 0.0,
           remove_thres: float = 0.4, min_thres: float = 0.1,
           attempts: int = 50):
    """image: (H, W, C); boxes: (K, 4); box_valid: (K,) bool. Returns new image."""
    h = valid_hw[0].astype(jnp.float32)
    w = valid_hw[1].astype(jnp.float32)
    u = jax.random.uniform(key, (attempts, 4))  # (size_h, size_w, top01, left01)

    areas = (boxes[:, 2] - boxes[:, 0]) * (boxes[:, 3] - boxes[:, 1])
    areas = jnp.maximum(areas, 1e-8)

    def attempt(carry, uu):
        rects, count = carry
        ch_ = uu[0] * 0.15 * h + 0.05 * h        # U(0.05h, 0.2h)
        cw_ = uu[1] * 0.15 * w + 0.05 * w
        top = uu[2] * (h - ch_)
        left = uu[3] * (w - cw_)
        # The reference truncates the rect to ints before intersecting/filling.
        x1 = jnp.floor(left)
        y1 = jnp.floor(top)
        x2 = jnp.floor(left + cw_)
        y2 = jnp.floor(top + ch_)
        iw = jnp.clip(jnp.minimum(x2, boxes[:, 2]) - jnp.maximum(x1, boxes[:, 0]), 0.0)
        ih = jnp.clip(jnp.minimum(y2, boxes[:, 3]) - jnp.maximum(y1, boxes[:, 1]), 0.0)
        ratio = jnp.where(box_valid, iw * ih / areas, -jnp.inf)
        rmax = jnp.max(ratio)
        ok = (rmax <= remove_thres) & (rmax >= min_thres) & (count < cut_num)
        rects = jnp.where(ok, rects.at[count % cut_num].set(jnp.stack([x1, y1, x2, y2])),
                          rects)
        return (rects, count + ok.astype(jnp.int32)), None

    init_rects = jnp.full((cut_num, 4), -1.0)
    (rects, count), _ = jax.lax.scan(attempt, (init_rects, jnp.int32(0)), u)

    chh, cww, _ = image.shape
    ys = jnp.arange(chh, dtype=jnp.float32)[:, None]
    xs = jnp.arange(cww, dtype=jnp.float32)[None, :]
    out = image
    for i in range(cut_num):
        r = rects[i]
        inside = (ys >= r[1]) & (ys < r[3]) & (xs >= r[0]) & (xs < r[2]) & (r[0] >= 0)
        out = jnp.where(inside[..., None], fill_val, out)
    return out
