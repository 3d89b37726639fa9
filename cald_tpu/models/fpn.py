"""Feature Pyramid Network (Flax, NHWC).

torchvision ``FeaturePyramidNetwork`` semantics (the reference backbones build it
via ``resnet_fpn_backbone``, /root/reference/detection/frcnn_la.py:283,
retinanet_cal.py:617-619): 1x1 lateral convs to ``out_channels``, nearest 2x
top-down upsampling with add, 3x3 smoothing convs, plus one of two extra blocks:

  - 'pool'  -> LastLevelMaxPool: stride-2 1x1 max pool on the last output
               (Faster R-CNN; the extra map feeds only the RPN).
  - 'p6p7'  -> LastLevelP6P7: stride-2 3x3 convs P6 = conv(C5-or-P5),
               P7 = conv(relu(P6)) (RetinaNet).
"""

from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp
from flax import linen as nn

from cald_tpu.models.layers import conv_kaiming


def upsample_nearest_to(x: jnp.ndarray, h: int, w: int) -> jnp.ndarray:
    """Nearest-neighbour upsample to an exact (h, w) — torchvision FPN uses
    F.interpolate(size=lateral.shape) so equal-resolution pyramids (MobileNetV3's
    two stride-32 maps) work too. Integer 2x is the common case and lowers to a
    broadcast-reshape."""
    b, xh, xw, c = x.shape
    if (xh, xw) == (h, w):
        return x
    if h == 2 * xh and w == 2 * xw:
        return jnp.broadcast_to(x[:, :, None, :, None, :], (b, xh, 2, xw, 2, c)).reshape(
            b, h, w, c)
    import jax

    return jax.image.resize(x, (b, h, w, c), method="nearest")


class FPN(nn.Module):
    """in: ordered coarse-to-fine-last list of feature maps (finest first);
    out: same-resolution pyramid at ``out_channels`` + optional extra level(s)."""

    out_channels: int = 256
    extra: str = "pool"   # 'pool' | 'p6p7' | 'none'
    dtype: object = None

    @nn.compact
    def __call__(self, feats: Sequence[jnp.ndarray]) -> list[jnp.ndarray]:
        n = len(feats)
        laterals = [
            nn.Conv(self.out_channels, (1, 1), kernel_init=conv_kaiming,
                    dtype=self.dtype, name=f"lateral{i}")(f)
            for i, f in enumerate(feats)
        ]
        # top-down pathway, coarsest to finest
        merged = [None] * n
        merged[n - 1] = laterals[n - 1]
        for i in range(n - 2, -1, -1):
            up = upsample_nearest_to(merged[i + 1], laterals[i].shape[1],
                                     laterals[i].shape[2])
            merged[i] = laterals[i] + up
        outs = [
            nn.Conv(self.out_channels, (3, 3), padding=[(1, 1), (1, 1)],
                    kernel_init=conv_kaiming, dtype=self.dtype, name=f"output{i}")(m)
            for i, m in enumerate(merged)
        ]
        if self.extra == "pool":
            # LastLevelMaxPool is max_pool(kernel=1, stride=2) == subsampling
            outs.append(outs[-1][:, ::2, ::2, :])
        elif self.extra == "p6p7":
            p6 = nn.Conv(self.out_channels, (3, 3), strides=(2, 2),
                         padding=[(1, 1), (1, 1)], kernel_init=conv_kaiming,
                         dtype=self.dtype, name="p6")(outs[-1])
            p7 = nn.Conv(self.out_channels, (3, 3), strides=(2, 2),
                         padding=[(1, 1), (1, 1)], kernel_init=conv_kaiming,
                         dtype=self.dtype, name="p7")(nn.relu(p6))
            outs.extend([p6, p7])
        elif self.extra != "none":
            raise ValueError(f"unknown extra block {self.extra!r}")
        return outs
