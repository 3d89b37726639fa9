"""Host-side weight import from torch checkpoints (pretrained backbones).

The reference always starts from torchvision ImageNet backbones
(pretrained_backbone=True in every constructor); matching its mAP requires the
same initialization. ``load_resnet50_imagenet`` maps a torchvision resnet50
state_dict (names conv1/bn1/layerX.Y.{conv,bn}Z/downsample) onto the
``ResNetBackbone`` param + frozen trees.
"""

from cald_tpu.convert.torchvision_import import (
    load_resnet50_imagenet,
    torch_conv_to_flax,
)

__all__ = ["load_resnet50_imagenet", "torch_conv_to_flax"]
