"""Photometric augmentations (boxes unchanged). Valid-region aware.

Matches the math of /root/reference/cald/cald_helper.py:56-85 and torchvision's
functional brightness/contrast/saturation adjustments, restricted to the valid
(h, w) region of the fixed canvas so zero padding stays zero.

Pixel convention: this pipeline carries RAW 0..255 pixels end to end
(cald_tpu/data/batching.py). The reference instead converts to 0..1 via
``to_tensor`` before each photometric op, so its constants are rescaled here:
``randn * std / 255`` on 0..1 pixels == ``randn * std`` on 0..255 pixels, and
torchvision's [0, 1] clamp in adjust_brightness/contrast/saturation becomes
[0, 255]. Salt-pepper (image max/min) and channel swaps are scale-invariant.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_GRAY = jnp.asarray([0.2989, 0.587, 0.114])


def _valid_mask(image, valid_hw):
    ch, cw, _ = image.shape
    ys = jnp.arange(ch)[:, None]
    xs = jnp.arange(cw)[None, :]
    return ((ys < valid_hw[0]) & (xs < valid_hw[1]))[..., None]


def gaussian_noise(image: jnp.ndarray, valid_hw, key: jax.Array, std: float = 1.0):
    """image + N(0,1) * std on the valid region of a 0..255 image — equal to the
    reference's ``+ randn * std / 255`` on its 0..1 tensor (cald_helper.py:72-75).
    Like the reference, no clamp: the detector normalize absorbs the range."""
    noise = jax.random.normal(key, image.shape, image.dtype) * std
    return jnp.where(_valid_mask(image, valid_hw), image + noise, image)


def salt_pepper_noise(image: jnp.ndarray, valid_hw, key: jax.Array, prob: float = 0.1):
    """Pixels < prob/2 -> image max ('salt'); > 1 - prob/2 -> image min ('pepper')
    (cald_helper.py:78-85). Max/min computed over the valid region."""
    mask = _valid_mask(image, valid_hw)
    big = jnp.max(jnp.where(mask, image, -jnp.inf))
    small = jnp.min(jnp.where(mask, image, jnp.inf))
    u = jax.random.uniform(key, image.shape, image.dtype)
    out = jnp.where(u < prob / 2, big, image)
    out = jnp.where(u > 1 - prob / 2, small, out)
    return jnp.where(mask, out, image)


_PERMS = ((0, 1, 2), (0, 2, 1), (1, 0, 2), (1, 2, 0), (2, 0, 1), (2, 1, 0))


def color_swap(image: jnp.ndarray, valid_hw, key: jax.Array):
    """Random channel permutation (cald_helper.py:56-62)."""
    idx = jax.random.randint(key, (), 0, len(_PERMS))
    perms = jnp.asarray(_PERMS, dtype=jnp.int32)
    swapped = jnp.take(image, perms[idx], axis=-1)
    return jnp.where(_valid_mask(image, valid_hw), swapped, image)


def color_adjust(image: jnp.ndarray, valid_hw, factor: float,
                 white_level: float = 255.0):
    """brightness x f, then contrast x f, then saturation x f, each clamped to
    [0, white_level] (cald_helper.py:65-69 -> torchvision functional semantics,
    whose clamp bound is 1.0 on its 0..1 tensors; 255 on this raw pipeline)."""
    mask = _valid_mask(image, valid_hw)
    out = jnp.clip(image * factor, 0.0, white_level)  # brightness

    gray = jnp.tensordot(out, _GRAY.astype(out.dtype), axes=[[-1], [0]])
    n_valid = jnp.maximum(jnp.sum(mask[..., 0]), 1)
    # torchvision adjust_contrast blends with the mean of the grayscale image.
    mean_gray = jnp.sum(jnp.where(mask[..., 0], gray, 0.0)) / n_valid
    out = jnp.clip(factor * out + (1 - factor) * mean_gray, 0.0, white_level)
    gray = jnp.tensordot(out, _GRAY.astype(out.dtype), axes=[[-1], [0]])[..., None]
    out = jnp.clip(factor * out + (1 - factor) * gray, 0.0, white_level)
    return jnp.where(mask, out, image)
