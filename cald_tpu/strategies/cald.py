"""CALD scoring + two-stage selection, batched on device.

Reference flow (/root/reference/cald_train.py:91-271,436-448):
  stage 0  score: per pool image — base detect, subsample dets (>40 -> 50
           linspace indices, :110-113), per-class max-score vector ``cls_corr``
           (:114-117), augment (image + ref boxes), detect each augmented copy,
           consistency = mean over augs of min over ref boxes of
           |maxIoU + 0.5(1-JS)(pm+pm') - bp|   (:202-225)
  stage 1  ascending argsort of consistency, keep mr*budget candidates (:439-441)
  stage 2  ``cls_kldiv`` (:234-271): rank candidates by JS divergence between the
           labeled-set mean class-count vector and the candidate's mean cls_corr
           (softmax both), force-include zero-detection candidates, take budget.
           (The reference's greedy loop never updates ``result`` — the append is
           commented out at :258 — so it IS a static ranking; replicated as such.)

TPU re-design: the whole stage-0 inner loop is ONE jitted function per pool
batch: detect(B) -> subsample -> build_aug_batch(B*A on device) -> detect(B*A)
-> cald_consistency kernel. (1+A) detector forwards per image still happen, but
batched across the pool and with zero host round-trips.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Callable, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from cald_tpu.augment import build_aug_batch
from cald_tpu.ops.consistency import cald_consistency, class_correlation


@dataclasses.dataclass(frozen=True)
class CALDConfig:
    aug_names: tuple = ("flip", "cut_out", "smaller_resize", "rotation")  # 'FCDR'
    base_point: float = 1.3           # -bp (cald_train.py:517)
    mutual_range: float = 1.2         # -mr (cald_train.py:516)
    uniform: bool = False
    no_mutual: bool = False
    k_ref: int = 50                   # subsample target (cald_train.py:111)
    subsample_threshold: int = 40     # subsample trigger (cald_train.py:110)
    # Detect shrink-resize augs on a proportionally smaller canvas slice
    # (~35% fewer FLOPs for that forward). Near-exact on zero-bias norms;
    # with trained norm biases the coarse-level edge band shifts scores
    # slightly (EXPERIMENTS.md deviation study quantifies it), so the
    # reference-faithful default keeps the full canvas.
    shrink_slice: bool = False


def subsample_reference(boxes, scores, labels, scores_cls, prob_max, valid, *,
                        k_ref: int = 50, threshold: int = 40):
    """The reference's detection subsampling (cald_train.py:110-113) on fixed
    slots: when more than ``threshold`` valid detections exist, keep
    ``round(linspace(0, n-1, k_ref))`` (duplicates preserved); else the first
    k_ref slots. Detections arrive score-sorted (NMS output), like the reference.

    All inputs (K, ...) -> outputs (k_ref, ...).
    """
    n = jnp.sum(valid.astype(jnp.int32))
    lin = jnp.round(jnp.linspace(0.0, jnp.maximum(n - 1, 0).astype(jnp.float32),
                                 k_ref)).astype(jnp.int32)
    first = jnp.arange(k_ref, dtype=jnp.int32)
    take = jnp.where(n > threshold, lin, first)
    new_valid = jnp.where(n > threshold, jnp.ones((k_ref,), bool), first < n)
    g = lambda a: jnp.take(a, take, axis=0)
    return (g(boxes), g(scores), g(labels), g(scores_cls), g(prob_max),
            new_valid & jnp.take(valid, take, axis=0))


def _shrink_ratio(name: str) -> float | None:
    """Down-scale ratio of a resize-family augmentation, else None."""
    base, _, arg = name.partition(":")
    if base == "smaller_resize":
        return float(arg) if arg else 0.8
    if base == "resize" and arg and float(arg) < 1.0:
        return float(arg)
    return None


def _ceil_mult(x: float, m: int = 64) -> int:
    import math

    return int(math.ceil(x / m)) * m


def make_cald_score_fn(model, cfg: CALDConfig, num_classes: int) -> Callable:
    """Returns jitted fn(variables, images, valid_hw, key) ->
    (consistency (B,), cls_corrs (B, num_classes-1)).

    With ``cfg.shrink_slice`` (opt-in), shrink-resize augs detect on a
    proportionally smaller canvas: the scaled content lives in the canvas's
    top-left corner, so slicing to ceil64(ratio * canvas) before the detector
    drops only zero padding — ~35% fewer backbone/RPN FLOPs for that forward
    (PERF.md round 3). Exact when norm biases are zero; with trained biases
    the coarse-level padding halo differs by canvas, shifting scores slightly
    (EXPERIMENTS.md)."""
    aug_names = tuple(cfg.aug_names)

    def _detect_augs(variables, aug_images, aug_hw, b: int):
        """(B, A, H, W, 3) -> Detections stacked as (B, A, K, ...)."""
        a = aug_images.shape[1]
        h, w = aug_images.shape[2:4]
        ratios = [_shrink_ratio(n) if cfg.shrink_slice else None
                  for n in aug_names]
        groups: dict = {}
        for i, r in enumerate(ratios):
            key_ = None
            if r is not None:
                ch, cw = _ceil_mult(h * r), _ceil_mult(w * r)
                if ch < h or cw < w:
                    key_ = (ch, cw)
            groups.setdefault(key_, []).append(i)
        parts = {}
        for key_, idxs in groups.items():
            ims = aug_images[:, jnp.asarray(idxs)] if len(idxs) < a else aug_images
            if key_ is not None:
                ims = ims[:, :, : key_[0], : key_[1]]
            hws = aug_hw[:, jnp.asarray(idxs)].reshape(-1, 2)
            d = model.apply(variables,
                            ims.reshape((b * len(idxs),) + ims.shape[2:]),
                            hws, method="detect")
            d = jax.tree.map(
                lambda t: t.reshape((b, len(idxs)) + t.shape[1:]), d)
            for j, i in enumerate(idxs):
                parts[i] = jax.tree.map(lambda t: t[:, j], d)
        return jax.tree.map(lambda *ts: jnp.stack(ts, axis=1),
                            *[parts[i] for i in range(a)])

    def score_batch(variables, images, valid_hw, key):
        b = images.shape[0]
        base = model.apply(variables, images, valid_hw, method="detect")

        sub = jax.vmap(partial(subsample_reference, k_ref=cfg.k_ref,
                               threshold=cfg.subsample_threshold))(
            base.boxes, base.scores, base.labels, base.scores_cls,
            base.prob_max, base.valid)
        ref_boxes, ref_scores, ref_labels, ref_scores_cls, ref_prob_max, ref_valid = sub

        # base cls_corr from the SUBSAMPLED detections (cald_train.py:114-117)
        base_corr = class_correlation(ref_scores, ref_labels, ref_valid,
                                      num_classes - 1)

        # augs run in the model's compute dtype: the warp/noise kernels are
        # memory-bound and the detector casts to bf16 anyway (+-0.5 pixel-value
        # rounding on the augmented copies only)
        aug_dtype = getattr(model.cfg, "compute_dtype", "float32")
        aug_in = images if aug_dtype == "float32" else images.astype(aug_dtype)
        aug_images, aug_boxes, aug_hw = build_aug_batch(
            aug_in, ref_boxes, ref_valid, valid_hw, key, aug_names)
        a = len(aug_names)
        dets = _detect_augs(variables, aug_images, aug_hw, b)
        det_boxes = dets.boxes                                # (B, A, K, 4)
        k_det = det_boxes.shape[2]
        det_scores_cls = dets.scores_cls
        det_prob_max = dets.prob_max
        det_valid = dets.valid

        consistency = cald_consistency(
            aug_boxes, ref_scores_cls, ref_prob_max, ref_valid,
            det_boxes, det_scores_cls, det_prob_max, det_valid,
            jnp.float32(cfg.base_point))

        aug_corr = class_correlation(
            dets.scores, dets.labels,
            det_valid, num_classes - 1)                       # (B, A, C-1)
        all_corr = jnp.concatenate([base_corr[:, None], aug_corr], axis=1)
        mean_corr = jnp.mean(all_corr, axis=1)
        # zero-detection image: reference records only the base cls_corr
        # (all zeros) and consistency 0.0 (cald_train.py:118-121)
        ref_any = jnp.any(ref_valid, axis=-1)
        cls_corrs = jnp.where(ref_any[:, None], mean_corr, base_corr)
        return consistency, cls_corrs

    return jax.jit(score_batch)


def score_pool(score_fn: Callable, variables, loader, key: jax.Array,
               pool_indices: Sequence[int], put=None):
    """Drive score_fn over a pool loader; de-duplicates padded batch entries.

    ``put`` optionally shards each batch over a device mesh (the pool is the
    embarrassingly parallel axis — SURVEY.md §2.7).
    Returns (consistency (N,), cls_corrs (N, C-1)) aligned with pool_indices.
    """
    pos = {int(idx): i for i, idx in enumerate(pool_indices)}
    n = len(pool_indices)
    consistency = np.zeros((n,), np.float64)
    cls_corrs = None
    seen = np.zeros((n,), bool)

    def record(pending):
        nonlocal cls_corrs
        c_dev, corr_dev, image_idx = pending
        c = np.asarray(c_dev)
        corr = np.asarray(corr_dev)
        if cls_corrs is None:
            cls_corrs = np.zeros((n, corr.shape[-1]), np.float64)
        for i, idx in enumerate(image_idx):
            p = pos[int(idx)]
            consistency[p] = c[i]
            cls_corrs[p] = corr[i]
            seen[p] = True

    # keep one batch in flight: dispatch batch k+1 (and let the loader build
    # it) while the device scores batch k — on the remote-exec backend the
    # fixed ~30 ms dispatch overhead and host-side decode otherwise serialize
    # with device compute (PERF.md)
    pending = None
    for bi, batch in enumerate(loader):
        if put is not None:
            batch = put(batch)
        c, corr = score_fn(variables, jnp.asarray(batch.images),
                           jnp.asarray(batch.valid_hw),
                           jax.random.fold_in(key, bi))
        if pending is not None:
            record(pending)
        pending = (c, corr, batch.image_idx)
    if pending is not None:
        record(pending)
    if not seen.all():
        raise RuntimeError(f"pool scoring missed {int((~seen).sum())} images")
    return consistency, cls_corrs


def labeled_class_counts(dataset, labeled_indices, num_fg_classes: int) -> np.ndarray:
    """Mean per-image class-count vector over the labeled set
    (cls_kldiv's ``result``, cald_train.py:238-243)."""
    out = np.zeros((len(labeled_indices), num_fg_classes), np.float64)
    for i, idx in enumerate(labeled_indices):
        rec = dataset.record(int(idx))
        for l in rec.labels:
            out[i, int(l) - 1] += 1
    return out.mean(axis=0) if len(out) else np.zeros((num_fg_classes,))


def _softmax(x: np.ndarray, axis=-1) -> np.ndarray:
    e = np.exp(x - x.max(axis=axis, keepdims=True))
    return e / e.sum(axis=axis, keepdims=True)


def _js(p: np.ndarray, q: np.ndarray) -> np.ndarray:
    m = (p + q) / 2.0
    def kl(a, b):
        return np.sum(np.where(a > 0, a * (np.log(np.maximum(a, 1e-30))
                                           - np.log(np.maximum(b, 1e-30))), 0.0),
                      axis=-1)
    return 0.5 * kl(p, m) + 0.5 * kl(q, m)


def cls_kldiv_rank(cand_corrs: np.ndarray, labeled_mean: np.ndarray, budget: int,
                   *, uniform: bool = False) -> np.ndarray:
    """Stage-2 ranking (cald_train.py:234-271). Returns positions into
    cand_corrs, zero-detection candidates first, then by class-balance JS."""
    zero_det = np.where(cand_corrs.sum(axis=1) == 0)[0]
    chosen = list(zero_det)
    if len(chosen) < budget:
        if uniform:
            p = _softmax(labeled_mean[None] + cand_corrs)
            q = _softmax(np.ones_like(labeled_mean))[None]
            js = _js(p, q)
            js[np.asarray(chosen, int)] = np.inf
            order = np.argsort(js, kind="stable")          # closest to uniform
        else:
            p = _softmax(labeled_mean)[None]
            q = _softmax(cand_corrs)
            js = _js(p, q)
            js[np.asarray(chosen, int)] = -np.inf
            order = np.argsort(-js, kind="stable")         # most divergent
        for i in order:
            if len(chosen) >= budget:
                break
            chosen.append(int(i))
    return np.asarray(chosen, int)


def cald_select(consistency: np.ndarray, cls_corrs: np.ndarray,
                labeled_mean: np.ndarray, budget: int, cfg: CALDConfig) -> np.ndarray:
    """Full two-stage selection; returns positions into the pool array."""
    arg = np.argsort(consistency, kind="stable")
    if cfg.no_mutual:
        return arg[:budget]
    n_cand = min(int(cfg.mutual_range * budget), len(arg))
    cand = arg[:n_cand]
    picked = cls_kldiv_rank(cls_corrs[cand], labeled_mean, budget,
                            uniform=cfg.uniform)
    return cand[picked]
