"""CIFAR-10/100 data for the LL4AL demo.

Reads the standard python-pickle batch files (``cifar-10-batches-py/`` /
``cifar-100-python/``) when present — no torchvision download machinery —
and provides a seeded synthetic generator for tests and smoke runs.

Augmentation is DEVICE-side and batched (TPU-style), replacing the
reference's per-sample torchvision transforms (ll4al/main.py:41-47):
random horizontal flip + random 32x32 crop from 4px zero padding +
per-channel normalization, all inside the jitted train step.
"""

from __future__ import annotations

import os
import pickle

import jax
import jax.numpy as jnp
import numpy as np

CIFAR10_MEAN = (0.4914, 0.4822, 0.4465)
CIFAR10_STD = (0.2023, 0.1994, 0.2010)


def load_cifar10(root: str):
    """Returns (train_images (50000, 32, 32, 3) uint8, train_labels (50000,),
    test_images, test_labels) from the standard batch files."""
    d = os.path.join(root, "cifar-10-batches-py")

    def read(name):
        with open(os.path.join(d, name), "rb") as f:
            raw = pickle.load(f, encoding="bytes")
        x = raw[b"data"].reshape(-1, 3, 32, 32).transpose(0, 2, 3, 1)
        return x, np.asarray(raw[b"labels"], np.int32)

    xs, ys = zip(*[read(f"data_batch_{i}") for i in range(1, 6)])
    tx, ty = read("test_batch")
    return np.concatenate(xs), np.concatenate(ys), tx, ty


def synthetic_cifar(num_train: int = 512, num_test: int = 128,
                    num_classes: int = 10, seed: int = 0):
    """Class-colored noise images: trivially learnable, zero I/O."""
    rng = np.random.default_rng(seed)

    def make(n):
        y = rng.integers(0, num_classes, n).astype(np.int32)
        base = (np.linspace(0, 255, num_classes)[y])[:, None, None, None]
        x = np.clip(base + rng.normal(0, 40, (n, 32, 32, 3)), 0, 255)
        return x.astype(np.uint8), y

    xtr, ytr = make(num_train)
    xte, yte = make(num_test)
    return xtr, ytr, xte, yte


def normalize(images: jnp.ndarray) -> jnp.ndarray:
    """uint8/float 0..255 -> normalized float32 (ll4al/main.py:45)."""
    x = images.astype(jnp.float32) / 255.0
    mean = jnp.asarray(CIFAR10_MEAN)
    std = jnp.asarray(CIFAR10_STD)
    return (x - mean) / std


def augment_batch(images: jnp.ndarray, key: jax.Array) -> jnp.ndarray:
    """Batched random flip + random crop (pad 4), on device.

    images: (B, 32, 32, 3) raw 0..255. Returns same shape, raw range.
    """
    b, h, w, _ = images.shape
    kf, kc = jax.random.split(key)
    flip = jax.random.bernoulli(kf, 0.5, (b,))
    images = jnp.where(flip[:, None, None, None], images[:, :, ::-1, :], images)
    pad = jnp.pad(images, ((0, 0), (4, 4), (4, 4), (0, 0)))
    offs = jax.random.randint(kc, (b, 2), 0, 9)
    crop = jax.vmap(lambda im, o: jax.lax.dynamic_slice(
        im, (o[0], o[1], 0), (h, w, 3)))(pad, offs)
    return crop
