"""Host-side training transforms (NumPy) + the device-side normalizer.

The reference applies ToTensor + RandomHorizontalFlip on host per image
(/root/reference/detection/transforms.py:27-50). Here the flip stays on host (it
happens before padding, so it is a cheap NumPy view) while normalization moves
into the jitted model preprocess so it fuses with the first conv.
"""

from __future__ import annotations

import numpy as np

# torchvision GeneralizedRCNNTransform defaults (/root/reference/frcnn_la.py:230-234).
IMAGENET_MEAN = np.asarray([0.485, 0.456, 0.406], np.float32)
IMAGENET_STD = np.asarray([0.229, 0.224, 0.225], np.float32)


def random_horizontal_flip(image: np.ndarray, boxes: np.ndarray,
                           rng: np.random.Generator, p: float = 0.5):
    """Flip image (H, W, C) and xyxy boxes with probability p
    (reference transforms.py:27-45)."""
    if rng.random() < p:
        width = image.shape[1]
        image = image[:, ::-1, :]
        if len(boxes):
            boxes = boxes.copy()
            boxes[:, [0, 2]] = width - boxes[:, [2, 0]]
    return image, boxes


def normalize_image(image, mean=IMAGENET_MEAN, std=IMAGENET_STD):
    """(image/255 - mean) / std; works on numpy or jnp arrays, any leading dims."""
    return (image / 255.0 - mean) / std
