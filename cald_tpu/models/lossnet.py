"""LL4AL loss-prediction module (reference ll4al/models/lossnet.py:31-65).

Per pyramid level: global average pool -> Dense(interm_dim) -> ReLU; the
concatenated level embeddings feed a final Dense(1) predicting the task loss.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn


class LossNet(nn.Module):
    num_levels: int = 4
    interm_dim: int = 128

    @nn.compact
    def __call__(self, pyramid: Sequence[jnp.ndarray]) -> jnp.ndarray:
        """pyramid: list of (B, H_l, W_l, C_l); returns (B,) predicted losses."""
        embs = []
        for i, f in enumerate(pyramid[: self.num_levels]):
            g = jnp.mean(f, axis=(1, 2))                       # GAP
            e = nn.relu(nn.Dense(self.interm_dim, name=f"fc{i}")(g))
            embs.append(e)
        x = jnp.concatenate(embs, axis=-1)
        return nn.Dense(1, name="linear")(x)[:, 0]


def loss_pred_loss(pred: jnp.ndarray, target: jnp.ndarray,
                   margin: float = 1.0) -> jnp.ndarray:
    """LL4AL margin-ranking loss (reference ll4al/main.py:64-83).

    Pairs (i, flip(i)) over the batch: hinge on whether the predicted-loss
    difference agrees in sign with the true-loss difference. Batch must be even
    (the reference asserts the same); target is stop-gradiented like the
    reference's .detach().
    """
    b = pred.shape[0]
    half = b // 2
    target = jax.lax.stop_gradient(target)
    p = pred[: 2 * half]
    t = target[: 2 * half]
    pdiff = p[:half] - p[half:][::-1]
    tdiff = t[:half] - t[half:][::-1]
    sign = jnp.where(tdiff > 0, 1.0, -1.0)
    loss = jnp.clip(margin - sign * pdiff, 0.0)
    return jnp.sum(loss) / jnp.maximum(half, 1)
