"""The CALD augmentation suite: build all augmented variants of a batch at once.

Maps the reference's aug-string protocol (/root/reference/cald_train.py:314-326):
  'F' -> flip, 'C' -> cut_out(2), 'D' -> smaller_resize(0.8), 'R' -> rotation(5deg),
  'G' -> gaussian noise(std 16), 'S' -> salt-pepper(0.1)
plus the long-form names accepted by get_uncertainty (multi_* variants included).

``build_aug_batch`` vmaps each augmentation over the image batch and stacks the
results into ``(B, A, H, W, C)`` images / ``(B, A, K, 4)`` transformed reference
boxes / ``(B, A, 2)`` valid sizes — ready for one batched detector forward.
"""

from __future__ import annotations

from typing import Callable, Sequence

import jax
import jax.numpy as jnp

from cald_tpu.augment.cutout import cutout
from cald_tpu.augment.geometry import horizontal_flip, resize_image_boxes, rotate_image_boxes
from cald_tpu.augment.photometric import (
    color_adjust, color_swap, gaussian_noise, salt_pepper_noise,
)

AUG_CODES = {"F": "flip", "C": "cut_out", "D": "smaller_resize", "R": "rotation",
             "G": "ga", "S": "sp"}


def expand_aug_string(augs: str) -> list[str]:
    """'FCDR' -> ['flip', 'cut_out', 'smaller_resize', 'rotation'] in the
    evaluation order used by the reference scorer (flip, ga, color, sp, cut_out,
    resize, rotation — cald_train.py:123-183)."""
    order = ["flip", "ga", "cut_out", "smaller_resize", "rotation", "sp"]
    names = {AUG_CODES[ch] for ch in augs if ch in AUG_CODES}
    return [n for n in order if n in names]


def expand_multi(name: str) -> list[str]:
    """Expand the reference's multi_* aug families (cald_train.py:131-183) into
    parameterized entries accepted by ``_aug_fn``."""
    if name == "multi_ga":            # std 8..48 (cald_train.py:132-135)
        return [f"ga:{8 * i}" for i in range(1, 7)]
    if name == "multi_sp":            # prob 0.05..0.30 (:152-156)
        return [f"sp:{0.05 * i:g}" for i in range(1, 7)]
    if name == "multi_cut_out":       # cut_num 1..4 (:161-165)
        return [f"cut_out:{i}" for i in range(1, 5)]
    if name == "multi_resize":        # ratios 0.7..0.9 (:166-170)
        return [f"resize:{i * 0.1:g}" for i in range(7, 10)]
    if name == "multi_color_adjust":  # factors 2..5 (:143-146)
        return [f"color_adjust:{i}" for i in range(2, 6)]
    raise ValueError(f"unknown multi augmentation {name!r}")


def _aug_fn(name: str) -> Callable:
    """Returns fn(image, boxes, box_valid, valid_hw, key) -> (img, boxes, valid_hw).

    Parameterized forms: 'ga:24', 'sp:0.15', 'cut_out:3', 'resize:0.7',
    'rotation:10', 'color_adjust:2' (the multi_* families expand to these,
    see ``expand_multi``).
    """
    base, _, arg = name.partition(":")
    val = float(arg) if arg else None
    if base == "flip":
        return lambda im, bx, bv, hw, k: horizontal_flip(im, bx, hw)
    if base == "cut_out":
        n = int(val) if val is not None else 2
        return lambda im, bx, bv, hw, k: (cutout(im, bx, bv, hw, k, cut_num=n), bx, hw)
    if base == "smaller_resize":
        return lambda im, bx, bv, hw, k: resize_image_boxes(im, bx, hw, val or 0.8)
    if base == "larger_resize":
        return lambda im, bx, bv, hw, k: resize_image_boxes(im, bx, hw, val or 1.2)
    if base == "resize":
        return lambda im, bx, bv, hw, k: resize_image_boxes(im, bx, hw, val)
    if base == "rotation":
        return lambda im, bx, bv, hw, k: rotate_image_boxes(im, bx, hw, val or 5.0)
    if base == "ga":
        return lambda im, bx, bv, hw, k: (gaussian_noise(im, hw, k, val or 16.0), bx, hw)
    if base == "sp":
        return lambda im, bx, bv, hw, k: (salt_pepper_noise(im, hw, k, val or 0.1), bx, hw)
    if base == "color_adjust":
        return lambda im, bx, bv, hw, k: (color_adjust(im, hw, val or 1.5), bx, hw)
    if base == "color_swap":
        return lambda im, bx, bv, hw, k: (color_swap(im, hw, k), bx, hw)
    if base.startswith("multi_"):
        raise ValueError(f"{name}: expand with expand_multi() first")
    raise ValueError(f"unknown augmentation {name!r}")


def build_aug_batch(images: jnp.ndarray, ref_boxes: jnp.ndarray,
                    ref_valid: jnp.ndarray, valid_hw: jnp.ndarray,
                    key: jax.Array, aug_names: Sequence[str]):
    """Apply every augmentation to every image.

    images: (B, H, W, C); ref_boxes: (B, K, 4); ref_valid: (B, K);
    valid_hw: (B, 2) int32.

    Returns (aug_images (B, A, H, W, C), aug_boxes (B, A, K, 4),
             aug_valid_hw (B, A, 2)).
    """
    b = images.shape[0]
    outs_img, outs_box, outs_hw = [], [], []
    for i, name in enumerate(aug_names):
        fn = _aug_fn(name)
        keys = jax.random.split(jax.random.fold_in(key, i), b)
        im, bx, hw = jax.vmap(fn)(images, ref_boxes, ref_valid, valid_hw, keys)
        outs_img.append(im)
        outs_box.append(bx)
        outs_hw.append(hw)
    return (jnp.stack(outs_img, axis=1), jnp.stack(outs_box, axis=1),
            jnp.stack(outs_hw, axis=1))
