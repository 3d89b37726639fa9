"""Flax detector models (TPU-first re-designs of the reference L2 layer).

Every model is fixed-shape end to end: images arrive as padded canvas batches
(``cald_tpu.data.Batch``), detections leave as K fixed slots + validity masks
(``Detections``), and training-time sampling runs under explicit RNG keys inside
jit. The CALD extras the reference bolts onto torchvision — per-detection
``props``, ``prob_max``, ``scores_cls`` (/root/reference/detection/frcnn_la.py:126-142,
retinanet_cal.py:437-488) — are first-class fields here.
"""

from cald_tpu.models.detections import Detections
from cald_tpu.models.resnet import ResNetBackbone
from cald_tpu.models.mobilenetv3 import MobileNetV3Backbone
from cald_tpu.models.fpn import FPN
from cald_tpu.models.anchors import generate_anchors, grid_anchors_for_level
from cald_tpu.models.matcher import match_anchors
from cald_tpu.models.faster_rcnn import (
    FasterRCNN,
    FasterRCNNConfig,
    fasterrcnn_resnet50_fpn_feature,
    fasterrcnn_mobilenetv3_fpn_feature,
)
from cald_tpu.models.retinanet import (
    RetinaNet,
    RetinaNetConfig,
    retinanet_resnet50_fpn_cal,
    retinanet_mobilenet,
)
from cald_tpu.models.lossnet import LossNet
from cald_tpu.models.vae import VAAL_VAE, VAALDiscriminator

__all__ = [
    "Detections",
    "ResNetBackbone",
    "MobileNetV3Backbone",
    "FPN",
    "generate_anchors",
    "grid_anchors_for_level",
    "match_anchors",
    "FasterRCNN",
    "FasterRCNNConfig",
    "fasterrcnn_resnet50_fpn_feature",
    "fasterrcnn_mobilenetv3_fpn_feature",
    "RetinaNet",
    "RetinaNetConfig",
    "retinanet_resnet50_fpn_cal",
    "retinanet_mobilenet",
    "LossNet",
    "VAAL_VAE",
    "VAALDiscriminator",
]
