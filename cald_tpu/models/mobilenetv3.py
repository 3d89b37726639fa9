"""MobileNetV3-Large backbone (Flax, NHWC).

Same inverted-residual schedule as the reference's vendored torchvision copy
(/root/reference/detection/mobilenetv3.py:216-270): 15 bnecks with SE and
hard-swish per the paper, plus the final 960-channel conv. ``is_strided`` stage
boundaries (used by the reference's freezing logic, retinanet_cal.py:695-706)
map to the ``stage_ids`` attribute here; freezing is an optimizer mask.
"""

from __future__ import annotations

from typing import NamedTuple, Sequence

import jax.numpy as jnp
from flax import linen as nn

from cald_tpu.models.layers import conv_kaiming, make_norm


def hard_sigmoid(x):
    return nn.relu6(x + 3.0) / 6.0


def hard_swish(x):
    return x * hard_sigmoid(x)


class BneckCfg(NamedTuple):
    in_ch: int
    kernel: int
    expand: int
    out_ch: int
    se: bool
    act: str      # 'RE' or 'HS'
    stride: int


# torchvision mobilenet_v3_large schedule (reference mobilenetv3.py:231-253).
LARGE_CFG: tuple[BneckCfg, ...] = (
    BneckCfg(16, 3, 16, 16, False, "RE", 1),
    BneckCfg(16, 3, 64, 24, False, "RE", 2),
    BneckCfg(24, 3, 72, 24, False, "RE", 1),
    BneckCfg(24, 5, 72, 40, True, "RE", 2),
    BneckCfg(40, 5, 120, 40, True, "RE", 1),
    BneckCfg(40, 5, 120, 40, True, "RE", 1),
    BneckCfg(40, 3, 240, 80, False, "HS", 2),
    BneckCfg(80, 3, 200, 80, False, "HS", 1),
    BneckCfg(80, 3, 184, 80, False, "HS", 1),
    BneckCfg(80, 3, 184, 80, False, "HS", 1),
    BneckCfg(80, 3, 480, 112, True, "HS", 1),
    BneckCfg(112, 3, 672, 112, True, "HS", 1),
    BneckCfg(112, 5, 672, 160, True, "HS", 2),
    BneckCfg(160, 5, 960, 160, True, "HS", 1),
    BneckCfg(160, 5, 960, 160, True, "HS", 1),
)


class SqueezeExcite(nn.Module):
    channels: int
    squeeze: int

    @nn.compact
    def __call__(self, x):
        s = jnp.mean(x, axis=(-3, -2), keepdims=True)
        s = nn.Conv(self.squeeze, (1, 1), name="fc1")(s)
        s = nn.relu(s)
        s = nn.Conv(self.channels, (1, 1), name="fc2")(s)
        return x * hard_sigmoid(s)


class InvertedResidual(nn.Module):
    cfg: BneckCfg
    norm: str = "frozen"
    dtype: object = None

    @nn.compact
    def __call__(self, x):
        c = self.cfg
        norm = make_norm(self.norm, self.dtype)
        act = hard_swish if c.act == "HS" else nn.relu
        y = x
        if c.expand != c.in_ch:
            y = nn.Conv(c.expand, (1, 1), use_bias=False, kernel_init=conv_kaiming,
                        dtype=self.dtype, name="expand")(y)
            y = norm(c.expand)(y)
            y = act(y)
        pad = (c.kernel - 1) // 2
        y = nn.Conv(c.expand, (c.kernel, c.kernel), strides=(c.stride, c.stride),
                    padding=[(pad, pad), (pad, pad)], feature_group_count=c.expand,
                    use_bias=False, kernel_init=conv_kaiming, dtype=self.dtype,
                    name="depthwise")(y)
        y = norm(c.expand)(y)
        y = act(y)
        if c.se:
            # torchvision squeezes to in/4 of the EXPANDED channels, rounded to 8
            sq = _make_divisible(c.expand // 4)
            y = SqueezeExcite(c.expand, sq, name="se")(y)
        y = nn.Conv(c.out_ch, (1, 1), use_bias=False, kernel_init=conv_kaiming,
                    dtype=self.dtype, name="project")(y)
        y = norm(c.out_ch)(y)
        if c.stride == 1 and c.in_ch == c.out_ch:
            y = y + x
        return y


def _make_divisible(v: int, divisor: int = 8) -> int:
    new_v = max(divisor, int(v + divisor / 2) // divisor * divisor)
    if new_v < 0.9 * v:
        new_v += divisor
    return new_v


class MobileNetV3Backbone(nn.Module):
    """Features trunk. Returns a dict of the requested stage outputs.

    Stages (stride boundaries + final conv): c0=stem(16, /2), c1=24 (/4),
    c2=40 (/8), c3=80 (/16), c4=160 (/32), c5=final 960-ch conv (/32).
    ``returned``: which stage keys to emit.
    """

    returned: Sequence[str] = ("c5",)
    norm: str = "frozen"
    dtype: object = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> dict[str, jnp.ndarray]:
        norm = make_norm(self.norm, self.dtype)
        y = nn.Conv(16, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)],
                    use_bias=False, kernel_init=conv_kaiming, dtype=self.dtype,
                    name="stem")(x)
        y = norm(16)(y)
        y = hard_swish(y)

        feats = {"c0": y}
        stage = 0
        for i, cfg in enumerate(LARGE_CFG):
            if cfg.stride == 2:
                stage += 1
            y = InvertedResidual(cfg, self.norm, self.dtype, name=f"block{i}")(y)
            feats[f"c{stage}"] = y
        y = nn.Conv(960, (1, 1), use_bias=False, kernel_init=conv_kaiming,
                    dtype=self.dtype, name="lastconv")(y)
        y = norm(960)(y)
        y = hard_swish(y)
        feats["c5"] = y
        return {k: feats[k] for k in self.returned}


STAGE_CHANNELS = {"c0": 16, "c1": 24, "c2": 40, "c3": 80, "c4": 160, "c5": 960}
