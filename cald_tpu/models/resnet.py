"""ResNet backbone (Flax, NHWC) with torchvision layout for weight import.

The reference uses torchvision ``resnet50`` with FrozenBatchNorm and
``trainable_backbone_layers=3`` (layer2..layer4 train; stem+layer1 frozen) via
``resnet_fpn_backbone`` (/root/reference/detection/frcnn_la.py:283,
retinanet_cal.py:617-619). Freezing here is handled by the optimizer mask
(``cald_tpu.engine.optim.trainable_mask``); norm statistics are frozen by
construction (see ``FrozenBatchNorm``).

Module/param names intentionally mirror torchvision (layer1..layer4, conv1/bn1,
downsample) so the torch->flax checkpoint converter is a mechanical rename.
"""

from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp
from flax import linen as nn

from cald_tpu.models.layers import conv_kaiming, make_norm


class Bottleneck(nn.Module):
    """1x1 -> 3x3(stride) -> 1x1(x4) with projection shortcut on shape change."""

    planes: int
    stride: int = 1
    norm: str = "frozen"
    dtype: object = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        norm = make_norm(self.norm, self.dtype)
        out_ch = self.planes * 4
        identity = x
        y = nn.Conv(self.planes, (1, 1), use_bias=False, kernel_init=conv_kaiming,
                    dtype=self.dtype, name="conv1")(x)
        y = norm(self.planes)(y)
        y = nn.relu(y)
        y = nn.Conv(self.planes, (3, 3), strides=(self.stride, self.stride),
                    padding=[(1, 1), (1, 1)], use_bias=False,
                    kernel_init=conv_kaiming, dtype=self.dtype, name="conv2")(y)
        y = norm(self.planes)(y)
        y = nn.relu(y)
        y = nn.Conv(out_ch, (1, 1), use_bias=False, kernel_init=conv_kaiming,
                    dtype=self.dtype, name="conv3")(y)
        y = norm(out_ch)(y)
        if identity.shape[-1] != out_ch or self.stride != 1:
            identity = nn.Conv(out_ch, (1, 1), strides=(self.stride, self.stride),
                               use_bias=False, kernel_init=conv_kaiming,
                               dtype=self.dtype, name="downsample_conv")(x)
            identity = norm(out_ch)(identity)
        return nn.relu(y + identity)


class ResNetBackbone(nn.Module):
    """Returns the C2..C5 pyramid as a dict {'c2': ..., 'c5': ...} (NHWC).

    blocks_per_stage (3,4,6,3) = ResNet-50; (2,2,2,2) with width 16 makes a tiny
    CPU-testable variant.
    """

    blocks_per_stage: Sequence[int] = (3, 4, 6, 3)
    width: int = 64
    norm: str = "frozen"
    dtype: object = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> dict[str, jnp.ndarray]:
        norm = make_norm(self.norm, self.dtype)
        w = self.width
        y = nn.Conv(w, (7, 7), strides=(2, 2), padding=[(3, 3), (3, 3)],
                    use_bias=False, kernel_init=conv_kaiming, dtype=self.dtype, name="conv1")(x)
        y = norm(w)(y)
        y = nn.relu(y)
        y = nn.max_pool(y, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)])

        feats = {}
        for stage, n_blocks in enumerate(self.blocks_per_stage):
            planes = w * (2 ** stage)
            for b in range(n_blocks):
                stride = 2 if (b == 0 and stage > 0) else 1
                y = Bottleneck(planes, stride, self.norm, self.dtype,
                               name=f"layer{stage + 1}_{b}")(y)
            feats[f"c{stage + 2}"] = y
        return feats

    @property
    def out_channels(self) -> tuple[int, ...]:
        return tuple(self.width * (2 ** s) * 4 for s in range(len(self.blocks_per_stage)))


def resnet50(norm: str = "frozen") -> ResNetBackbone:
    return ResNetBackbone(blocks_per_stage=(3, 4, 6, 3), width=64, norm=norm)
