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
    """1x1 -> 3x3(stride) -> 1x1(x4) with projection shortcut on shape change.

    ``folded=True`` (stride-1 identity blocks, frozen norm only) returns the
    block's folded-weight tuple for the fused Pallas stage kernel instead of
    computing: (w1 (C,P), b1, w2 (3,3,P,P), b2, w3 (P,C4), b3) with each
    frozen norm folded into its conv (ops/pallas_bottleneck.py).
    """

    planes: int
    stride: int = 1
    norm: str = "frozen"
    dtype: object = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, *, folded: bool = False):
        norm = make_norm(self.norm, self.dtype)
        out_ch = self.planes * 4
        conv1 = nn.Conv(self.planes, (1, 1), use_bias=False,
                        kernel_init=conv_kaiming, dtype=self.dtype, name="conv1")
        bn1 = norm(self.planes)
        conv2 = nn.Conv(self.planes, (3, 3), strides=(self.stride, self.stride),
                        padding=[(1, 1), (1, 1)], use_bias=False,
                        kernel_init=conv_kaiming, dtype=self.dtype, name="conv2")
        bn2 = norm(self.planes)
        conv3 = nn.Conv(out_ch, (1, 1), use_bias=False,
                        kernel_init=conv_kaiming, dtype=self.dtype, name="conv3")
        bn3 = norm(out_ch)

        if folded:
            assert self.stride == 1 and x.shape[-1] == out_ch and \
                self.norm == "frozen", "folded needs a stride-1 identity block"
            dt = self.dtype or jnp.float32
            # materialize the conv params without real compute (DCE'd)
            conv1(jnp.zeros((1, 1, 1, x.shape[-1]), dt))
            conv2(jnp.zeros((1, 1, 1, self.planes), dt))
            conv3(jnp.zeros((1, 1, 1, self.planes), dt))
            from cald_tpu.ops.pallas_bottleneck import fold_frozen

            k1 = conv1.variables["params"]["kernel"][0, 0]       # (C, P)
            k2 = conv2.variables["params"]["kernel"]             # (3, 3, P, P)
            k3 = conv3.variables["params"]["kernel"][0, 0]       # (P, C4)
            w1, b1 = fold_frozen(k1, *bn1.fold())
            w2, b2 = fold_frozen(k2, *bn2.fold())
            w3, b3 = fold_frozen(k3, *bn3.fold())
            return w1, b1, w2, b2, w3, b3

        identity = x
        y = nn.relu(bn1(conv1(x)))
        y = nn.relu(bn2(conv2(y)))
        y = bn3(conv3(y))
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

    def _fuse_gate(self) -> str:
        """Fused Pallas bottleneck stages: frozen-norm TPU inference only (the
        fused path folds norms into weights and has no autodiff rule).

        OPT-IN via CALD_TPU_PALLAS_BNECK: "1" = per-block fusion (measured at
        parity-to-slightly-worse vs XLA's convs on v5e — XLA convs run
        ~125 TFLOP/s and pipeline well; the per-block VMEM win did not
        materialize, PERF.md round 2); "stage" = stage-in-one-kernel fusion
        (one pallas_call per stride-1 suffix, all inter-block activations
        VMEM-resident — the round-2 backlog's remaining backbone lever).
        Default "" keeps the XLA path.
        """
        import os

        import jax as _jax

        if (self.norm != "frozen"
                or _jax.default_backend() not in ("tpu", "axon")):
            return ""
        return os.environ.get("CALD_TPU_PALLAS_BNECK", "")

    @nn.compact
    def __call__(self, x: jnp.ndarray, *,
                 allow_fused: bool = False) -> dict[str, jnp.ndarray]:
        norm = make_norm(self.norm, self.dtype)
        w = self.width
        y = nn.Conv(w, (7, 7), strides=(2, 2), padding=[(3, 3), (3, 3)],
                    use_bias=False, kernel_init=conv_kaiming, dtype=self.dtype, name="conv1")(x)
        y = norm(w)(y)
        y = nn.relu(y)
        y = nn.max_pool(y, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)])

        fuse = self._fuse_gate() if allow_fused else ""
        feats = {}
        for stage, n_blocks in enumerate(self.blocks_per_stage):
            planes = w * (2 ** stage)
            blocks = [Bottleneck(planes, 2 if (b == 0 and stage > 0) else 1,
                                 self.norm, self.dtype,
                                 name=f"layer{stage + 1}_{b}")
                      for b in range(n_blocks)]
            # block 0 (projection / stride-2) always runs the XLA path; the
            # stride-1 identity suffix fuses into one VMEM-resident Pallas
            # chain when shapes admit a tiling (ops/pallas_bottleneck.py)
            y = blocks[0](y)
            rest = blocks[1:]
            out = None
            if fuse and rest:
                from cald_tpu.ops.pallas_bottleneck import (
                    maybe_fused_stage, maybe_fused_stage_deep)

                folded = [blk(y, folded=True) for blk in rest]
                fuse_fn = (maybe_fused_stage_deep if fuse == "stage"
                           else maybe_fused_stage)
                out = fuse_fn(y, folded)
            if out is None:
                for blk in rest:
                    y = blk(y)
            else:
                y = out
            feats[f"c{stage + 2}"] = y
        return feats

    @property
    def out_channels(self) -> tuple[int, ...]:
        return tuple(self.width * (2 ** s) * 4 for s in range(len(self.blocks_per_stage)))


def resnet50(norm: str = "frozen") -> ResNetBackbone:
    return ResNetBackbone(blocks_per_stage=(3, 4, 6, 3), width=64, norm=norm)
