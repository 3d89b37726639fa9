"""LS/C baseline: localization stability under noise
(/root/reference/ls_c_train.py:108-155).

Per image: base detect; keep top-30 detections by prob_max (:122-124);
U = max(1 - prob_max) (:126); for 6 gaussian-noise levels (std 8..48, :128-131)
re-detect and accumulate each reference box's best (unclamped) IoU against the
noisy detections (:139-151); stability_i = sum/6; image score =
sum(prob_max * stability) / sum(prob_max) - U (:152-155). Ascending selection.

TPU re-design mirrors the CALD scorer: all 6 noisy variants of the whole batch
are built on device and detected in one batched forward.
"""

from __future__ import annotations

from functools import partial
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np

from cald_tpu.augment.photometric import gaussian_noise
from cald_tpu.ops.boxes import pairwise_iou_nocheck

NOISE_STDS = (8.0, 16.0, 24.0, 32.0, 40.0, 48.0)


def _top30(dets, k: int = 30):
    """Top-k detections by prob_max (ls_c_train.py:122-124), fixed slots."""
    pm = jnp.where(dets.valid, dets.prob_max, -jnp.inf)
    _, idx = jax.lax.top_k(pm, min(k, pm.shape[-1]))
    g = lambda a: jnp.take_along_axis(a, idx[..., None] if a.ndim == 3 else idx,
                                      axis=1)
    return (g(dets.boxes), jnp.take_along_axis(dets.prob_max, idx, axis=1),
            jnp.take_along_axis(dets.valid, idx, axis=1))


def make_lsc_score_fn(model, stds=NOISE_STDS) -> Callable:
    """Returns jitted fn(variables, images, valid_hw, key) -> scores (B,)."""

    def fn(variables, images, valid_hw, key):
        b = images.shape[0]
        base = model.apply(variables, images, valid_hw, method="detect")
        ref_boxes, prob_max, ref_valid = _top30(base)

        noisy = []
        for i, std in enumerate(stds):
            keys = jax.random.split(jax.random.fold_in(key, i), b)
            noisy.append(jax.vmap(partial(gaussian_noise, std=std))(
                images, valid_hw, keys))
        noisy = jnp.stack(noisy, axis=1)                      # (B, S, H, W, C)
        s = len(stds)
        dets = model.apply(variables, noisy.reshape((b * s,) + noisy.shape[2:]),
                           jnp.tile(valid_hw[:, None], (1, s, 1)).reshape(b * s, 2),
                           method="detect")
        k_det = dets.boxes.shape[1]
        det_boxes = dets.boxes.reshape(b, s, k_det, 4)
        det_valid = dets.valid.reshape(b, s, k_det)

        # per (image, noise, ref box): max unclamped IoU over noisy detections
        iou = jax.vmap(jax.vmap(pairwise_iou_nocheck, in_axes=(0, None)),
                       in_axes=(0, 0))(
            jnp.repeat(ref_boxes[:, None], s, axis=1).reshape(b * s, -1, 4),
            det_boxes.reshape(b * s, k_det, 4),
        ).reshape(b, s, ref_boxes.shape[1], k_det)
        iou = jnp.where(det_valid[:, :, None, :], iou, -1.0)
        best = jnp.clip(jnp.max(iou, axis=-1), 0.0)           # (B, S, K)
        # an empty noisy output contributes 0 (the reference `continue`s)
        best = jnp.where(jnp.any(det_valid, axis=-1)[:, :, None], best, 0.0)
        stability = jnp.sum(best, axis=1) / len(stds)         # (B, K)

        pm = jnp.where(ref_valid, prob_max, 0.0)
        num = jnp.sum(pm * stability, axis=-1)
        den = jnp.maximum(jnp.sum(pm, axis=-1), 1e-12)
        u_max = jnp.max(jnp.where(ref_valid, 1.0 - prob_max, -jnp.inf), axis=-1)
        score = num / den - u_max
        # zero-detection images score 0.0 (ls_c_train.py:119-121)
        return jnp.where(jnp.any(ref_valid, axis=-1), score, 0.0)

    return jax.jit(fn)


def lsc_scores(score_fn: Callable, variables, loader, key, pool_indices) -> np.ndarray:
    pos = {int(idx): i for i, idx in enumerate(pool_indices)}
    out = np.zeros((len(pool_indices),))
    for bi, batch in enumerate(loader):
        sc = np.asarray(score_fn(variables, jnp.asarray(batch.images),
                                 jnp.asarray(batch.valid_hw),
                                 jax.random.fold_in(key, bi)))
        for i, idx in enumerate(batch.image_idx):
            out[pos[int(idx)]] = sc[i]
    return out
