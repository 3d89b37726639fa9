"""Cross-check the self-contained COCO evaluator against pycocotools.

pycocotools is optional in this environment; when importable, randomized
scenes — crowd gts, area-range boundary boxes, duplicate/overlapping dets,
empty images — must produce IDENTICAL 12-metric summaries from
``coco_evaluate_detections`` and the canonical COCOeval. When absent, the
corner-case scenarios still run against hand-derived expectations in
tests/test_engine.py; this module is the external oracle.
"""

import numpy as np
import pytest

from cald_tpu.engine.coco_eval import coco_evaluate_detections

pycocotools = pytest.importorskip("pycocotools")


class _FakeDataset:
    """Minimal record()/class_names surface over in-memory scenes."""

    def __init__(self, records, class_names):
        self._records = records
        self.class_names = tuple(class_names)

    def __len__(self):
        return len(self._records)

    def record(self, i):
        return self._records[i]


def _random_scene(rng, num_images=6, num_classes=3, max_gt=8, max_det=14):
    from cald_tpu.data.records import ImageRecord

    records, det_results = [], []
    for i in range(num_images):
        ng = int(rng.integers(0, max_gt + 1))
        xy = rng.uniform(0, 180, (ng, 2))
        # wide area spread so small/medium/large ranges all populate
        wh = np.exp(rng.uniform(np.log(4), np.log(110), (ng, 2)))
        boxes = np.concatenate([xy, xy + wh], 1).astype(np.float32)
        labels = rng.integers(1, num_classes, ng).astype(np.int32)
        iscrowd = (rng.uniform(size=ng) < 0.2).astype(np.int32)
        records.append(ImageRecord(
            image_id=str(100 + i), image_path="", width=320, height=320,
            boxes=boxes, labels=labels, difficult=np.zeros(ng, np.int32),
            iscrowd=iscrowd))
        nd = int(rng.integers(0, max_det + 1))
        if ng and nd:
            # most dets perturb a gt (some sub-threshold, some duplicates)
            src = rng.integers(0, ng, nd)
            jitter = rng.normal(0, 6.0, (nd, 4)).astype(np.float32)
            dboxes = boxes[src] + jitter
        else:
            dxy = rng.uniform(0, 200, (nd, 2))
            dwh = np.exp(rng.uniform(np.log(4), np.log(90), (nd, 2)))
            dboxes = np.concatenate([dxy, dxy + dwh], 1).astype(np.float32)
        dboxes[:, 2:] = np.maximum(dboxes[:, 2:], dboxes[:, :2] + 0.5)
        det_results.append({
            "image_id": str(100 + i),
            "boxes": np.clip(dboxes, 0, 320),
            "scores": rng.uniform(0.05, 1.0, nd).astype(np.float32),
            "labels": rng.integers(1, num_classes, nd).astype(np.int32),
        })
    names = ["__background__"] + [f"c{k}" for k in range(1, num_classes)]
    return _FakeDataset(records, names), det_results


def _pycoco_stats(dataset, results):
    from pycocotools.coco import COCO
    from pycocotools.cocoeval import COCOeval

    images, anns, dets = [], [], []
    ann_id = 1
    for i in range(len(dataset)):
        rec = dataset.record(i)
        images.append({"id": int(rec.image_id), "width": rec.width,
                       "height": rec.height})
        for b, l, cr, ar in zip(rec.boxes, rec.labels, rec.iscrowd, rec.area):
            anns.append({"id": ann_id, "image_id": int(rec.image_id),
                         "category_id": int(l), "iscrowd": int(cr),
                         "area": float(ar),
                         "bbox": [float(b[0]), float(b[1]),
                                  float(b[2] - b[0]), float(b[3] - b[1])]})
            ann_id += 1
    for r in results:
        for b, s, l in zip(r["boxes"], r["scores"], r["labels"]):
            dets.append({"image_id": int(r["image_id"]), "category_id": int(l),
                         "score": float(s),
                         "bbox": [float(b[0]), float(b[1]),
                                  float(b[2] - b[0]), float(b[3] - b[1])]})
    gt = COCO()
    gt.dataset = {"images": images, "annotations": anns,
                  "categories": [{"id": k, "name": n} for k, n in
                                 enumerate(dataset.class_names) if k > 0]}
    gt.createIndex()
    ev = COCOeval(gt, gt.loadRes(dets) if dets else COCO(), iouType="bbox")
    ev.evaluate()
    ev.accumulate()
    ev.summarize()
    keys = ["AP", "AP50", "AP75", "APs", "APm", "APl",
            "AR1", "AR10", "AR100", "ARs", "ARm", "ARl"]
    return dict(zip(keys, [float(v) for v in ev.stats]))


@pytest.mark.parametrize("seed", [0, 1, 2, 3, 4])
def test_randomized_scenes_match_pycocotools(seed):
    rng = np.random.default_rng(seed)
    dataset, results = _random_scene(rng)
    ours = coco_evaluate_detections(results, dataset, print_fn=lambda *_: None)
    want = _pycoco_stats(dataset, results)
    for k, v in want.items():
        assert ours[k] == pytest.approx(v, abs=1e-9), (k, ours[k], v)
