"""Device-side CALD augmentations on (image, boxes) pairs.

The reference performs augmentation on host with PIL/torch per image
(/root/reference/cald/cald_helper.py); here every augmentation is a jit-able jnp
transform over fixed-shape NHWC images + box arrays, so the whole (1 + N_aug)
variant batch is materialized on device in one fused program.
"""

from cald_tpu.augment.geometry import horizontal_flip, resize_image_boxes, rotate_image_boxes
from cald_tpu.augment.photometric import (
    color_adjust,
    color_swap,
    gaussian_noise,
    salt_pepper_noise,
)
from cald_tpu.augment.cutout import cutout
from cald_tpu.augment.suite import (
    AUG_CODES, build_aug_batch, expand_aug_string, expand_multi,
)

__all__ = [
    "horizontal_flip",
    "resize_image_boxes",
    "rotate_image_boxes",
    "color_adjust",
    "color_swap",
    "gaussian_noise",
    "salt_pepper_noise",
    "cutout",
    "AUG_CODES",
    "build_aug_batch",
    "expand_aug_string",
    "expand_multi",
]
