"""A deliberately-naive, scalar-loop implementation of the COCO bbox protocol.

Second oracle for ``cald_tpu.engine.coco_eval`` in environments without
pycocotools (this box). Like tests/golden_reference.py it is an intentional
transcription of reference semantics — here the published COCO detection-eval
protocol (the reference's evaluator IS pycocotools,
/root/reference/detection/coco_eval.py:10-12) — written as per-image/
per-category/per-threshold Python loops with none of the vectorized structure
of the production evaluator, so shared-bug failure modes are disjoint.

Protocol constants and matching rules follow pycocotools.cocoeval.Params /
COCOeval.evaluateImg/accumulate/summarize exactly:
  * IoU thresholds 0.50:0.05:0.95, recall thresholds 0:0.01:1,
  * area ranges all/[0,1e5^2], small/[0,32^2], medium/[32^2,96^2],
    large/[96^2,1e5^2]; maxDets 1/10/100,
  * crowd gts use IoU = inter / det_area and may match many dets,
  * greedy per-det matching in score order, preferring non-ignored gts,
  * matched-to-ignored or out-of-area-unmatched dets are ignored,
  * 101-point interpolated precision, category means over npig>0 only.
"""

from __future__ import annotations

import numpy as np

# np.linspace, not 0.05*i arithmetic: the protocol compares rec >= thr /
# iou >= thr EXACTLY, and the two constructions differ at the ulp
IOU_THRS = [float(t) for t in np.linspace(0.5, 0.95, 10)]
REC_THRS = [float(t) for t in np.linspace(0.0, 1.0, 101)]
AREA_RNGS = {
    "all": (0.0, 1e5 ** 2),
    "small": (0.0, 32.0 ** 2),
    "medium": (32.0 ** 2, 96.0 ** 2),
    "large": (96.0 ** 2, 1e5 ** 2),
}
MAX_DETS = (1, 10, 100)


def _iou_xyxy(det, gt, crowd: bool) -> float:
    dx1, dy1, dx2, dy2 = det
    gx1, gy1, gx2, gy2 = gt
    iw = min(dx2, gx2) - max(dx1, gx1)
    ih = min(dy2, gy2) - max(dy1, gy1)
    if iw <= 0 or ih <= 0:
        return 0.0
    inter = iw * ih
    darea = (dx2 - dx1) * (dy2 - dy1)
    if crowd:
        denom = darea
    else:
        denom = darea + (gx2 - gx1) * (gy2 - gy1) - inter
    return inter / denom if denom > 0 else 0.0


def _match_image(dets, gts, iou_thr: float, area_rng, max_det: int):
    """One (image, category, iouThr, areaRng, maxDets) cell.

    dets: list of (box_xyxy, score) sorted descending by score upstream;
    gts: list of (box_xyxy, iscrowd, area).
    Returns (det_scores, det_matched, det_ignored, n_nonignored_gt).
    """
    lo, hi = area_rng
    g_ignore = [bool(cr) or a < lo or a > hi for (_, cr, a) in gts]
    # gts sorted ignore-last, stable (pycocotools argsort(gtIg, mergesort))
    order = sorted(range(len(gts)), key=lambda i: (g_ignore[i], i))
    dets = dets[:max_det]

    g_matched = [False] * len(gts)
    d_scores, d_matched, d_ignored = [], [], []
    for (dbox, dscore) in dets:
        best_iou = min(iou_thr, 1.0 - 1e-10)
        best = -1
        for gi in order:
            gbox, crowd, _ = gts[gi]
            if g_matched[gi] and not crowd:
                continue        # crowds may absorb multiple dets
            if best >= 0 and not g_ignore[best] and g_ignore[gi]:
                break           # ran out of non-ignored candidates
            iou = _iou_xyxy(dbox, gbox, bool(crowd))
            if iou < best_iou:
                continue
            best_iou = iou
            best = gi
        if best >= 0:
            g_matched[best] = True
            d_scores.append(dscore)
            d_matched.append(True)
            d_ignored.append(g_ignore[best])
        else:
            darea = (dbox[2] - dbox[0]) * (dbox[3] - dbox[1])
            d_scores.append(dscore)
            d_matched.append(False)
            d_ignored.append(darea < lo or darea > hi)
    npig = sum(1 for ig in g_ignore if not ig)
    return d_scores, d_matched, d_ignored, npig


def _pr_curves(cells):
    """Accumulate one (category, iouThr, areaRng, maxDets) slice over images.

    cells: list of _match_image outputs. Returns (ap, recall) or None when the
    slice has no non-ignored gt (excluded from means, pycocotools -1)."""
    npig = sum(c[3] for c in cells)
    if npig == 0:
        return None
    rows = []
    for scores, matched, ignored, _ in cells:
        rows.extend(zip(scores, matched, ignored))
    # global det ordering by score, stable across images (mergesort of -score)
    rows.sort(key=lambda r: -r[0])
    tp = fp = 0
    prec, rec = [], []
    for (_, m, ig) in rows:
        if ig:
            continue
        if m:
            tp += 1
        else:
            fp += 1
        prec.append(tp / (tp + fp))
        rec.append(tp / npig)
    recall = rec[-1] if rec else 0.0
    # backward-max interpolation, then sample at the 101 recall thresholds
    for i in range(len(prec) - 1, 0, -1):
        prec[i - 1] = max(prec[i - 1], prec[i])
    q = []
    for t in REC_THRS:
        # first index with rec >= t (pycocotools searchsorted left)
        idx = next((i for i, r in enumerate(rec) if r >= t), None)
        q.append(prec[idx] if idx is not None else 0.0)
    return sum(q) / len(q), recall


def naive_coco_stats(dataset, results) -> dict:
    """12-metric COCO bbox summary (same keys as coco_evaluate_detections)."""
    cats = sorted({int(l) for i in range(len(dataset))
                   for l in dataset.record(i).labels})
    by_img = {r["image_id"]: r for r in results}

    def cell_list(cat, area_key, max_det, iou_thr):
        cells = []
        for i in range(len(dataset)):
            rec = dataset.record(i)
            sel = [j for j, l in enumerate(rec.labels) if int(l) == cat]
            gts = [(tuple(map(float, rec.boxes[j])),
                    int(getattr(rec, "iscrowd", np.zeros(len(rec.labels)))[j]),
                    float(rec.area[j])) for j in sel]
            r = by_img.get(rec.image_id, None)
            dets = []
            if r is not None:
                dsel = [j for j, l in enumerate(r["labels"]) if int(l) == cat]
                dets = [(tuple(map(float, r["boxes"][j])), float(r["scores"][j]))
                        for j in dsel]
                # stable score sort (pycocotools argsort(-score, mergesort))
                dets = [dets[j] for j in
                        sorted(range(len(dets)), key=lambda j: -dets[j][1])]
            if not gts and not dets:
                continue        # pycocotools skips absent (img, cat) pairs
            cells.append(_match_image(dets, gts, iou_thr, AREA_RNGS[area_key],
                                      max_det))
        return cells

    def mean_ap(area_key, max_det, iou_thrs):
        vals = []
        for cat in cats:
            for t in iou_thrs:
                r = _pr_curves(cell_list(cat, area_key, max_det, t))
                if r is not None:
                    vals.append(r[0])
        return float(np.mean(vals)) if vals else -1.0

    def mean_ar(area_key, max_det):
        vals = []
        for cat in cats:
            for t in IOU_THRS:
                r = _pr_curves(cell_list(cat, area_key, max_det, t))
                if r is not None:
                    vals.append(r[1])
        return float(np.mean(vals)) if vals else -1.0

    return {
        "AP": mean_ap("all", 100, IOU_THRS),
        "AP50": mean_ap("all", 100, [IOU_THRS[0]]),
        "AP75": mean_ap("all", 100, [IOU_THRS[5]]),
        "APs": mean_ap("small", 100, IOU_THRS),
        "APm": mean_ap("medium", 100, IOU_THRS),
        "APl": mean_ap("large", 100, IOU_THRS),
        "AR1": mean_ar("all", 1),
        "AR10": mean_ar("all", 10),
        "AR100": mean_ar("all", 100),
        "ARs": mean_ar("small", 100),
        "ARm": mean_ar("medium", 100),
        "ARl": mean_ar("large", 100),
    }
