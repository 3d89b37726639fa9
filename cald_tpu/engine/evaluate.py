"""Batched eval inference driving the host-side evaluators.

Replaces the reference's batch-1 eval loops (engine.py:86-256) with canvas-
batched jitted inference; detections are rescaled to original coordinates on
device and converted to the small host-side result dicts the evaluators expect.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from cald_tpu.engine.coco_eval import coco_evaluate_detections
from cald_tpu.engine.voc_eval import voc_evaluate_detections


def run_inference(model, variables, loader, *, score_thresh: float = 0.0,
                  jit_fn=None) -> list[dict]:
    """Run detect over a loader; returns per-image result dicts in original
    image coordinates (later batches win on duplicate padded indices)."""
    detect = jit_fn or jax.jit(
        lambda v, im, hw: model.apply(v, im, hw, method="detect"))
    results: dict[int, dict] = {}
    for batch in loader:
        dets = detect(variables, jnp.asarray(batch.images),
                      jnp.asarray(batch.valid_hw))
        dets = dets.rescale(jnp.asarray(batch.scale))
        boxes = np.asarray(dets.boxes)
        scores = np.asarray(dets.scores)
        labels = np.asarray(dets.labels)
        valid = np.asarray(dets.valid)
        if score_thresh > 0:
            valid = valid & (scores > score_thresh)
        for i, idx in enumerate(batch.image_idx):
            m = valid[i]
            results[int(idx)] = {
                "dataset_index": int(idx),
                "boxes": boxes[i][m],
                "scores": scores[i][m],
                "labels": labels[i][m],
            }
    return list(results.values())


def evaluate(model, variables, loader, dataset, *, kind: str,
             classwise: bool = False, print_fn=print) -> dict:
    """kind: 'voc' or 'coco'. Returns the metric dict from the evaluator.

    Multi-process: each process runs inference on its own loader shard; the
    per-image result dicts are merged across processes before the (replicated,
    deterministic) evaluator runs — the analog of the reference's
    utils.all_gather of pickled predictions (utils.py:75-115)."""
    results = run_inference(model, variables, loader)
    if jax.process_count() > 1:
        from cald_tpu.parallel import all_gather_objects

        by_idx = {}
        for lst in all_gather_objects(results):
            for r in lst:
                by_idx[r["dataset_index"]] = r
        results = list(by_idx.values())
    for r in results:
        r["image_id"] = dataset.record(r["dataset_index"]).image_id
    if kind == "voc":
        return voc_evaluate_detections(results, dataset, print_fn=print_fn)
    if kind == "coco":
        return coco_evaluate_detections(results, dataset, classwise=classwise,
                                        print_fn=print_fn)
    raise ValueError(f"unknown eval kind {kind!r}")
