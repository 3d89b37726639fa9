"""Shared building blocks: frozen batch norm, conv init conventions."""

from __future__ import annotations

from typing import Callable

import jax.numpy as jnp
from flax import linen as nn

# torchvision conv init for backbones: kaiming_normal(fan_out, relu)
conv_kaiming = nn.initializers.variance_scaling(2.0, "fan_out", "truncated_normal")
# detection heads use normal(std=0.01)
head_normal = nn.initializers.normal(stddev=0.01)


class FrozenBatchNorm(nn.Module):
    """BatchNorm with all statistics AND affine params frozen.

    Matches torchvision's ``FrozenBatchNorm2d`` (used throughout detection
    backbones): y = (x - mean) * scale / sqrt(var + eps) + bias, where every
    tensor lives in the ``frozen`` variable collection — the optimizer never
    sees them, exactly like requires_grad=False in the reference.

    ``fold()`` exposes the affine form (w, b) so callers can fold the norm
    into an adjacent conv (the fused Pallas bottleneck path).
    """

    features: int
    eps: float = 1e-5

    def setup(self):
        f = self.features
        self._scale = self.variable("frozen", "scale",
                                    lambda: jnp.ones((f,), jnp.float32))
        self._bias = self.variable("frozen", "bias",
                                   lambda: jnp.zeros((f,), jnp.float32))
        self._mean = self.variable("frozen", "mean",
                                   lambda: jnp.zeros((f,), jnp.float32))
        self._var = self.variable("frozen", "var",
                                  lambda: jnp.ones((f,), jnp.float32))

    def fold(self):
        """(w, b) f32 such that norm(x) == x * w + b."""
        w = self._scale.value / jnp.sqrt(self._var.value + self.eps)
        return w, self._bias.value - self._mean.value * w

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        w, b = self.fold()
        # fold stats in f32, apply in the activation dtype (bf16 compute path)
        return x * w.astype(x.dtype) + b.astype(x.dtype)


def make_norm(kind: str, dtype=None) -> Callable[[int], nn.Module]:
    """norm factory: 'frozen' (reference default) or 'group' (from-scratch
    friendly; GN is batch-size independent, good for small detection batches)."""
    if kind == "frozen":
        return lambda features: FrozenBatchNorm(features)
    if kind == "group":
        import math

        # largest group count <= 32 that divides the channel count
        # (MobileNetV3 widths like 72/120/960 are not multiples of 32)
        return lambda features: nn.GroupNorm(
            num_groups=math.gcd(features, 32) if features % 32 else 32,
            dtype=dtype)
    raise ValueError(f"unknown norm kind {kind!r}")
