"""CIFAR ResNet-18 backbone for the LL4AL classification demo.

Re-designs /root/reference/ll4al/models/resnet.py (the kuangliu CIFAR variant:
3x3 stem, no max-pool, BasicBlocks 2-2-2-2, 4x4 final pool) in Flax/NHWC with
real BatchNorm running statistics (the reference trains in BN train mode).
Forward returns (logits, [c1..c4]) — the four stage outputs feed LossNet
exactly like the reference's ``return out, [out1, out2, out3, out4]``.
"""

from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp
from flax import linen as nn

from cald_tpu.models.layers import conv_kaiming


class BasicBlock(nn.Module):
    planes: int
    stride: int = 1
    dtype: object = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, *, train: bool) -> jnp.ndarray:
        norm = lambda name: nn.BatchNorm(  # noqa: E731
            use_running_average=not train, momentum=0.9, epsilon=1e-5,
            dtype=self.dtype, name=name)
        y = nn.Conv(self.planes, (3, 3), strides=(self.stride, self.stride),
                    padding=[(1, 1), (1, 1)], use_bias=False,
                    kernel_init=conv_kaiming, dtype=self.dtype, name="conv1")(x)
        y = nn.relu(norm("bn1")(y))
        y = nn.Conv(self.planes, (3, 3), padding=[(1, 1), (1, 1)],
                    use_bias=False, kernel_init=conv_kaiming, dtype=self.dtype,
                    name="conv2")(y)
        y = norm("bn2")(y)
        if self.stride != 1 or x.shape[-1] != self.planes:
            x = nn.Conv(self.planes, (1, 1), strides=(self.stride, self.stride),
                        use_bias=False, kernel_init=conv_kaiming,
                        dtype=self.dtype, name="shortcut_conv")(x)
            x = norm("shortcut_bn")(x)
        return nn.relu(y + x)


class CifarResNet18(nn.Module):
    """(B, 32, 32, 3) -> (logits (B, num_classes), [c1..c4 feature maps])."""

    num_classes: int = 10
    width: int = 64
    blocks_per_stage: Sequence[int] = (2, 2, 2, 2)
    dtype: object = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, *, train: bool = False):
        if self.dtype is not None:
            x = x.astype(self.dtype)
        y = nn.Conv(self.width, (3, 3), padding=[(1, 1), (1, 1)],
                    use_bias=False, kernel_init=conv_kaiming, dtype=self.dtype,
                    name="conv1")(x)
        y = nn.relu(nn.BatchNorm(use_running_average=not train, momentum=0.9,
                                 epsilon=1e-5, dtype=self.dtype, name="bn1")(y))
        feats = []
        for stage, n_blocks in enumerate(self.blocks_per_stage):
            planes = self.width * (2 ** stage)
            for b in range(n_blocks):
                stride = 2 if (b == 0 and stage > 0) else 1
                y = BasicBlock(planes, stride, self.dtype,
                               name=f"layer{stage + 1}_{b}")(y, train=train)
            feats.append(y)
        # the reference's avg_pool2d(out4, 4) == GAP at CIFAR sizes
        g = jnp.mean(feats[-1], axis=(1, 2))
        logits = nn.Dense(self.num_classes, name="linear")(g)
        return logits.astype(jnp.float32), feats
