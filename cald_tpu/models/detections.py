"""Fixed-slot detection container (the device-side analogue of the reference's
per-image result dicts, /root/reference/detection/frcnn_la.py:126-142)."""

from __future__ import annotations

import jax.numpy as jnp
from flax import struct


@struct.dataclass
class Detections:
    """K fixed detection slots per image.

    boxes:      (..., K, 4) xyxy in the model's input (resized) coordinates;
                multiply by 1/Batch.scale to recover original-image coords.
    scores:     (..., K) the selected class score.
    labels:     (..., K) int32, 1-based foreground class ids.
    valid:      (..., K) bool slot validity.
    scores_cls: (..., K, C) full class-score row per detection — softmax over all
                classes for Faster R-CNN (frcnn_la.py:46), sigmoid row for
                RetinaNet (retinanet_cal.py:437-488).
    prob_max:   (..., K) max of scores_cls over classes.
    props:      (..., K, 4) the RPN proposal each detection came from (Faster
                R-CNN only — zeros for RetinaNet; used by the LT/C strategy).
    """

    boxes: jnp.ndarray
    scores: jnp.ndarray
    labels: jnp.ndarray
    valid: jnp.ndarray
    scores_cls: jnp.ndarray
    prob_max: jnp.ndarray
    props: jnp.ndarray

    @property
    def num_slots(self) -> int:
        return self.boxes.shape[-2]

    def rescale(self, scale) -> "Detections":
        """Map boxes (and props) by 1/scale back to original image coordinates
        (the reference's transform.postprocess, frcnn_la.py:292-304)."""
        s = jnp.asarray(scale)[..., None, None]
        return self.replace(boxes=self.boxes / s, props=self.props / s)
