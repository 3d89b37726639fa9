"""VAAL networks (reference vaal/vaal_helper.py:20-143).

VAE: 5-conv encoder to a (1024, 8, 8) volume, fc mu/logvar with z_dim=256,
mirrored transposed-conv decoder; inputs are 256x256 images scaled to 0..255
(vaal_helper.py:78-83). Discriminator: z -> 512 -> 512 -> 1 sigmoid MLP.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn


class VAAL_VAE(nn.Module):
    z_dim: int = 256
    base_width: int = 128   # reference widths 128..1024; shrink for CPU tests
    start_hw: int = 8       # decoder seed resolution = image_size / 32

    @nn.compact
    def __call__(self, x: jnp.ndarray, key: jax.Array):
        """x: (B, 256, 256, 3) in 0..255. Returns (recon, z, mu, logvar)."""
        mu, logvar = self.encode(x)
        std = jnp.exp(0.5 * logvar)
        z = mu + std * jax.random.normal(key, mu.shape)
        recon = self.decode(z)
        return recon, z, mu, logvar

    def encode(self, x: jnp.ndarray):
        b = self.base_width
        widths = (b, 2 * b, 4 * b, 8 * b, 8 * b)
        y = x
        for i, w in enumerate(widths):
            y = nn.Conv(w, (4, 4), strides=(2, 2), padding=[(1, 1), (1, 1)],
                        use_bias=False, name=f"enc{i}")(y)
            y = nn.GroupNorm(num_groups=min(32, w), name=f"enc_norm{i}")(y)
            y = nn.leaky_relu(y, 0.2)
        y = y.reshape(y.shape[0], -1)
        mu = nn.Dense(self.z_dim, name="fc_mu")(y)
        logvar = nn.Dense(self.z_dim, name="fc_logvar")(y)
        return mu, logvar

    def decode(self, z: jnp.ndarray):
        b = self.base_width
        s = self.start_hw
        y = nn.Dense(8 * b * s * s, name="fc_dec")(z)
        y = y.reshape(z.shape[0], s, s, 8 * b)
        widths = (8 * b, 4 * b, 2 * b, b, 3)
        for i, w in enumerate(widths):
            # padding='SAME' gives exactly 2x upsampling (torch's k4 s2 p1)
            y = nn.ConvTranspose(w, (4, 4), strides=(2, 2), padding="SAME",
                                 name=f"dec{i}")(y)
            if i < len(widths) - 1:
                y = nn.GroupNorm(num_groups=min(32, w), name=f"dec_norm{i}")(y)
                y = nn.relu(y)
        return y


class VAALDiscriminator(nn.Module):
    hidden: int = 512

    @nn.compact
    def __call__(self, z: jnp.ndarray) -> jnp.ndarray:
        y = nn.relu(nn.Dense(self.hidden, name="fc1")(z))
        y = nn.relu(nn.Dense(self.hidden, name="fc2")(y))
        return nn.Dense(1, name="out")(y)[:, 0]   # logits; sigmoid at use site


def vae_loss(recon, x, mu, logvar, beta: float = 1.0) -> jnp.ndarray:
    """0.1 * MSE + beta * KLD (vaal_helper.py:171-180): MSE is the mean over
    all pixels, KLD the RAW batch sum -0.5 sum(1 + logvar - mu^2 - exp(logvar))
    — the reference does not normalize the KLD term, so neither do we."""
    mse = jnp.mean((recon - x) ** 2)
    kld = -0.5 * jnp.sum(1 + logvar - mu ** 2 - jnp.exp(logvar))
    return 0.1 * mse + beta * kld
