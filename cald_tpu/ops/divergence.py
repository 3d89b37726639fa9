"""KL / Jensen-Shannon divergence kernels.

Matches the numerics used by the reference scorer, which calls
``scipy.stats.entropy(p, m)`` (/root/reference/cald_train.py:211-216): both
arguments are normalized to sum to one, natural log, and ``0 * log(0/m) == 0``.
"""

from __future__ import annotations

import jax.numpy as jnp


def _normalize(p: jnp.ndarray) -> jnp.ndarray:
    return p / jnp.maximum(jnp.sum(p, axis=-1, keepdims=True), 1e-30)


def kl_divergence(p: jnp.ndarray, q: jnp.ndarray) -> jnp.ndarray:
    """``sum(p * log(p / q))`` over the last axis after normalizing both inputs
    (scipy.stats.entropy semantics)."""
    p = _normalize(p)
    q = _normalize(q)
    ratio = jnp.where(p > 0, p / jnp.maximum(q, 1e-30), 1.0)
    return jnp.sum(jnp.where(p > 0, p * jnp.log(ratio), 0.0), axis=-1)


def js_divergence(p: jnp.ndarray, q: jnp.ndarray) -> jnp.ndarray:
    """Jensen-Shannon divergence as computed by the CALD scorer:
    ``0.5 * KL(p, m) + 0.5 * KL(q, m)`` with ``m = (p + q) / 2`` formed BEFORE
    normalization (reference forms m from the raw rows), clamped at zero below.

    Note: the reference computes ``m = (p + q) / 2`` on the *unnormalized* rows and
    lets scipy normalize each argument independently — we reproduce exactly that.
    """
    m = (p + q) / 2.0
    js = 0.5 * kl_divergence(p, m) + 0.5 * kl_divergence(q, m)
    return jnp.maximum(js, 0.0)
