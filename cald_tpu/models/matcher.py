"""Anchor/proposal <-> ground-truth matching and balanced sampling, fixed-shape.

torchvision ``Matcher`` + ``BalancedPositiveNegativeSampler`` semantics (used by
the reference's RPN/RoI heads and RetinaNet: frcnn_la.py thresholds 0.7/0.3 and
0.5/0.5, retinanet_cal.py:358-363 thresholds 0.5/0.4 allow_low_quality), with the
per-image Python loops replaced by masked vector ops + Gumbel-top-k sampling.

Match codes: matched gt index >= 0, BELOW = -1, BETWEEN = -2.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from cald_tpu.ops.boxes import box_iou

BELOW = -1
BETWEEN = -2


def match_anchors(gt_boxes: jnp.ndarray, gt_valid: jnp.ndarray,
                  anchors: jnp.ndarray, *, high: float, low: float,
                  allow_low_quality: bool) -> jnp.ndarray:
    """Match each anchor to a gt box (torchvision Matcher).

    gt_boxes: (G, 4) padded; gt_valid: (G,); anchors: (N, 4).
    Returns matched idx per anchor: int32 in [0, G) or BELOW/BETWEEN.
    With zero valid gt, every anchor is BELOW (the reference raises/special-cases
    empty images; masking makes it total).
    """
    iou = box_iou(gt_boxes, anchors)                          # (G, N)
    iou = jnp.where(gt_valid[:, None], iou, -1.0)             # invalid gt never wins

    best_gt = jnp.argmax(iou, axis=0)                          # (N,)
    best_val = jnp.max(iou, axis=0)

    matches = jnp.where(best_val >= high, best_gt,
                        jnp.where(best_val < low, BELOW, BETWEEN))

    if allow_low_quality:
        # for each gt, anchors achieving its max IoU get (re-)assigned to it,
        # regardless of thresholds (torchvision set_low_quality_matches_).
        gt_max = jnp.max(iou, axis=1, keepdims=True)           # (G, 1)
        is_best_for_gt = (iou == gt_max) & gt_valid[:, None] & (gt_max > 0)
        any_best = jnp.any(is_best_for_gt, axis=0)             # (N,)
        # torchvision restores the pre-threshold best match for these anchors
        matches = jnp.where(any_best, best_gt, matches)

    # all-padding image: no positives at all
    matches = jnp.where(jnp.any(gt_valid), matches, BELOW)
    return matches.astype(jnp.int32)


def balanced_sample(matches: jnp.ndarray, key: jax.Array, *,
                    num_samples: int, positive_fraction: float):
    """Sample positives/negatives like BalancedPositiveNegativeSampler.

    matches: (N,) match codes. Picks up to ``num_samples * positive_fraction``
    positives uniformly at random, fills the rest with random negatives
    (BETWEEN entries are never sampled). Fixed output: indices (num_samples,)
    int32 + is_pos/valid masks. When positives are short, extra negatives fill
    in (same as the reference, which sizes the negative draw from the actual
    positive count).
    """
    n = matches.shape[0]
    pos_mask = matches >= 0
    neg_mask = matches == BELOW

    num_pos_target = int(round(num_samples * positive_fraction))
    kp, kn = jax.random.split(key)

    # Gumbel-top-k == uniform sampling without replacement among mask entries.
    gp = jax.random.gumbel(kp, (n,)) + jnp.where(pos_mask, 0.0, -jnp.inf)
    gn = jax.random.gumbel(kn, (n,)) + jnp.where(neg_mask, 0.0, -jnp.inf)

    num_pos_avail = jnp.sum(pos_mask)
    num_neg_avail = jnp.sum(neg_mask)
    num_pos = jnp.minimum(num_pos_target, num_pos_avail)
    num_neg = jnp.minimum(num_samples - num_pos, num_neg_avail)

    _, pos_idx = jax.lax.top_k(gp, num_samples)   # first num_pos entries are real
    _, neg_idx = jax.lax.top_k(gn, num_samples)

    ranks = jnp.arange(num_samples)
    take_pos = ranks < num_pos
    take_neg = ranks < num_neg
    # lay out positives first, then negatives, then padding
    neg_slot = ranks - num_pos
    idx = jnp.where(take_pos, pos_idx,
                    jnp.take(neg_idx, jnp.clip(neg_slot, 0, num_samples - 1)))
    valid = ranks < (num_pos + num_neg)
    is_pos = take_pos
    return idx.astype(jnp.int32), is_pos, valid
