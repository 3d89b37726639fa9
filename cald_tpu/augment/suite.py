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


def _aug_fn(name: str) -> Callable:
    """Returns fn(image, boxes, box_valid, valid_hw, key) -> (img, boxes, valid_hw)."""
    if name == "flip":
        return lambda im, bx, bv, hw, k: horizontal_flip(im, bx, hw)
    if name == "cut_out":
        return lambda im, bx, bv, hw, k: (cutout(im, bx, bv, hw, k, cut_num=2), bx, hw)
    if name == "smaller_resize":
        return lambda im, bx, bv, hw, k: resize_image_boxes(im, bx, hw, 0.8)
    if name == "larger_resize":
        return lambda im, bx, bv, hw, k: resize_image_boxes(im, bx, hw, 1.2)
    if name == "rotation":
        return lambda im, bx, bv, hw, k: rotate_image_boxes(im, bx, hw, 5.0)
    if name == "ga":
        return lambda im, bx, bv, hw, k: (gaussian_noise(im, hw, k, 16.0), bx, hw)
    if name == "sp":
        return lambda im, bx, bv, hw, k: (salt_pepper_noise(im, hw, k, 0.1), bx, hw)
    if name == "color_adjust":
        return lambda im, bx, bv, hw, k: (color_adjust(im, hw, 1.5), bx, hw)
    if name == "color_swap":
        return lambda im, bx, bv, hw, k: (color_swap(im, hw, k), bx, hw)
    if name.startswith("multi_"):
        raise ValueError(
            f"{name}: multi_* variants expand to several entries — pass e.g. "
            "['ga'] * 6 with explicit params via make_suite instead.")
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
