"""VAAL: variational adversarial active learning (/root/reference/vaal_train.py,
vaal/vaal_helper.py).

After (or alongside) task training each cycle: train a VAE on 256x256 resized
images from both pools plus a discriminator that predicts labeled-vs-unlabeled
from the latent mean; select the budget images the discriminator is most
confident are UNLABELED (vaal_helper.py:186-216).

Training losses per step (vaal_train.py:99-148):
  VAE:  vae_loss(labeled) + vae_loss(unlabeled)
        + adv_weight * BCE(D(mu_l), 1) + adv_weight * BCE(D(mu_u), 1)
        (the generator wants BOTH pools to look labeled)
  D:    BCE(D(mu_l), 1) + BCE(D(mu_u), 0)
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np

from cald_tpu.models.vae import VAAL_VAE, VAALDiscriminator, vae_loss
from cald_tpu.ops.losses import bce_with_logits

VAAL_IMAGE_SIZE = 256


def resize_for_vaal(images: jnp.ndarray, size: int = VAAL_IMAGE_SIZE) -> jnp.ndarray:
    """(B, H, W, 3) any size -> (B, size, size, 3), kept in 0..255
    (vaal_helper.py:78-83 resizes then multiplies by 255)."""
    b = images.shape[0]
    return jax.image.resize(images, (b, size, size, 3), method="bilinear")


class VAALTrainer:
    """Owns VAE + D params and their jitted update steps.

    Reference sizes: z_dim 256, widths 128..1024, 256x256 inputs
    (vaal_helper.py:20-118); smaller values keep CPU tests fast.
    """

    def __init__(self, *, z_dim: int = 256, base_width: int = 128,
                 image_size: int = VAAL_IMAGE_SIZE, lr: float = 5e-4,
                 beta: float = 1.0, adv_weight: float = 1.0, seed: int = 0,
                 vae_tx=None, d_tx=None):
        """``vae_tx``/``d_tx``: optax transforms for the two nets. The driver
        passes the reference's SGD(lr/10) / SGD(lr) with the MultiStep+warmup
        schedule (vaal_train.py:221-238); the Adam default here is the
        standalone/test fallback."""
        import optax

        self.vae = VAAL_VAE(z_dim=z_dim, base_width=base_width,
                            start_hw=image_size // 32)
        self.disc = VAALDiscriminator()
        self.beta = beta
        self.adv_weight = adv_weight
        self.image_size = image_size
        dummy = jnp.zeros((1, image_size, image_size, 3))
        self.vae_params = jax.jit(self.vae.init)(
            jax.random.key(seed), dummy, jax.random.key(0))["params"]
        self.d_params = jax.jit(self.disc.init)(
            jax.random.key(seed + 1), jnp.zeros((1, z_dim)))["params"]
        self.vae_tx = vae_tx if vae_tx is not None else optax.adam(lr)
        self.d_tx = d_tx if d_tx is not None else optax.adam(lr)
        self.vae_opt = self.vae_tx.init(self.vae_params)
        self.d_opt = self.d_tx.init(self.d_params)
        self._step = jax.jit(self._make_step())
        self._put_batch = None

    def place(self, put_batch, put_state) -> None:
        """Move the adversary onto the global data mesh (the driver's
        _mesh_hooks): params/opt replicated, each train_step's resized batches
        assembled into global batch-sharded arrays, so the jitted step's batch
        means give XLA the gradient all-reduce — the same DDP story as the
        detector (SURVEY §2.7-2.8). The reference trains its VAE+D on one GPU
        (vaal_train.py:99-148); process-replicated training was the round-3
        fallback this replaces."""
        (self.vae_params, self.d_params, self.vae_opt, self.d_opt) = put_state(
            (self.vae_params, self.d_params, self.vae_opt, self.d_opt))
        self._put_batch = put_batch

    def localize(self) -> None:
        """Pull globally-replicated params/opt back to host numpy so the
        process-local scoring pass (unlabeled_scores over each process's pool
        shard) and checkpointing can consume them."""
        from cald_tpu.parallel import to_host_local

        (self.vae_params, self.d_params, self.vae_opt, self.d_opt) = (
            to_host_local((self.vae_params, self.d_params, self.vae_opt,
                           self.d_opt)))
        self._put_batch = None

    def _make_step(self):
        vae, disc = self.vae, self.disc
        beta, adv = self.beta, self.adv_weight
        vae_tx, d_tx = self.vae_tx, self.d_tx

        def step(vae_params, d_params, vae_opt, d_opt, lab, unlab, key):
            k1, k2 = jax.random.split(key)

            def vae_loss_fn(vp):
                rl, _, mu_l, lv_l = vae.apply({"params": vp}, lab, k1)
                ru, _, mu_u, lv_u = vae.apply({"params": vp}, unlab, k2)
                rec = vae_loss(rl, lab, mu_l, lv_l, beta) + \
                    vae_loss(ru, unlab, mu_u, lv_u, beta)
                dl = disc.apply({"params": d_params}, mu_l)
                du = disc.apply({"params": d_params}, mu_u)
                adv_l = jnp.mean(bce_with_logits(dl, jnp.ones_like(dl)))
                adv_u = jnp.mean(bce_with_logits(du, jnp.ones_like(du)))
                return rec + adv * (adv_l + adv_u), (mu_l, mu_u)

            (vloss, _), vgrads = jax.value_and_grad(
                vae_loss_fn, has_aux=True)(vae_params)
            vup, vae_opt = vae_tx.update(vgrads, vae_opt, vae_params)
            import optax
            vae_params = optax.apply_updates(vae_params, vup)

            # the reference's D step re-encodes with the UPDATED VAE under
            # no_grad (vaal_train.py:125-128)
            _, _, mu_l2, _ = vae.apply({"params": vae_params}, lab, k1)
            _, _, mu_u2, _ = vae.apply({"params": vae_params}, unlab, k2)

            def d_loss_fn(dp):
                dl = disc.apply({"params": dp}, jax.lax.stop_gradient(mu_l2))
                du = disc.apply({"params": dp}, jax.lax.stop_gradient(mu_u2))
                return (jnp.mean(bce_with_logits(dl, jnp.ones_like(dl)))
                        + jnp.mean(bce_with_logits(du, jnp.zeros_like(du))))

            dloss, dgrads = jax.value_and_grad(d_loss_fn)(d_params)
            dup, d_opt = d_tx.update(dgrads, d_opt, d_params)
            d_params = optax.apply_updates(d_params, dup)
            return vae_params, d_params, vae_opt, d_opt, vloss, dloss

        return step

    def train_step(self, labeled_images: jnp.ndarray, unlabeled_images: jnp.ndarray,
                   key) -> tuple[float, float]:
        lab = resize_for_vaal(jnp.asarray(labeled_images), self.image_size)
        unlab = resize_for_vaal(jnp.asarray(unlabeled_images), self.image_size)
        if self._put_batch is not None:
            # resize first: per-process canvas shapes differ, the fixed
            # 256x256 VAAL shape is what makes the global concat legal
            lab = self._put_batch(np.asarray(lab))
            unlab = self._put_batch(np.asarray(unlab))
        (self.vae_params, self.d_params, self.vae_opt, self.d_opt,
         vloss, dloss) = self._step(self.vae_params, self.d_params,
                                    self.vae_opt, self.d_opt, lab, unlab, key)
        return float(vloss), float(dloss)

    def unlabeled_scores(self, images: jnp.ndarray, key) -> np.ndarray:
        """-sigmoid(D(mu)): higher = more unlabeled-looking
        (vaal_helper.py:186-216 picks top (-preds))."""
        x = resize_for_vaal(jnp.asarray(images), self.image_size)
        _, _, mu, _ = self.vae.apply({"params": self.vae_params}, x, key)
        d = self.disc.apply({"params": self.d_params}, mu)
        return -np.asarray(jax.nn.sigmoid(d))


def vaal_select(scores: np.ndarray, budget: int) -> np.ndarray:
    """Top-budget by score (scores already negated discriminator outputs)."""
    return np.argsort(-scores, kind="stable")[:budget]
