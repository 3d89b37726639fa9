"""Host-side data layer: dataset parsing, padded batching, AL pool bookkeeping.

TPU-first design notes (vs the reference's L1 layer, SURVEY.md §2.1):
  - Variable-size images are resized (min/max-side, reference
    ``GeneralizedRCNNTransform`` semantics) and padded onto a SMALL, STATIC set of
    canvas shapes so every jitted program sees fixed shapes. Aspect-ratio grouping
    (the reference's ``GroupedBatchSampler``) doubles as the canvas selector:
    a batch is always one canvas -> one compiled executable.
  - Variable-count annotations become K fixed slots + validity masks.
  - The AL labeled/unlabeled split is explicit, checkpointable state
    (the reference keeps it as Python lists that are lost on restart).
"""

from cald_tpu.data.voc import VOC_CLASSES, VOCDataset, get_voc2007, get_voc2012, parse_voc_xml
from cald_tpu.data.coco import COCO_CLASSES, CocoDataset, CocoIndex, get_coco
from cald_tpu.data.records import ImageRecord
from cald_tpu.data.transforms import normalize_image, random_horizontal_flip
from cald_tpu.data.batching import (
    Batch,
    Canvas,
    choose_canvas,
    create_aspect_ratio_groups,
    default_canvases,
    grouped_batch_indices,
    make_padded_batch,
    resize_scale,
)
from cald_tpu.data.pool import ALPoolState
from cald_tpu.data.loader import BatchLoader

__all__ = [
    "VOC_CLASSES",
    "VOCDataset",
    "get_voc2007",
    "get_voc2012",
    "parse_voc_xml",
    "COCO_CLASSES",
    "CocoDataset",
    "CocoIndex",
    "get_coco",
    "ImageRecord",
    "normalize_image",
    "random_horizontal_flip",
    "Batch",
    "Canvas",
    "choose_canvas",
    "create_aspect_ratio_groups",
    "default_canvases",
    "grouped_batch_indices",
    "make_padded_batch",
    "resize_scale",
    "ALPoolState",
    "BatchLoader",
]
