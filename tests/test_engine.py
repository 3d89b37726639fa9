"""Engine tests: schedules, optimizer masking, VOC/COCO evaluators (golden
hand-computed scenarios), checkpoint round-trip."""

import numpy as np
import pytest

from cald_tpu.engine.schedules import multistep_with_warmup
from cald_tpu.engine.optim import make_sgd, trainable_mask
from cald_tpu.engine.voc_eval import voc_ap, voc_eval_class, voc_evaluate_detections
from cald_tpu.engine.coco_eval import coco_evaluate_detections, iou_matrix
from cald_tpu.engine.logging import MetricLogger, SmoothedValue


class TestSchedules:
    def test_warmup_then_decay(self):
        sched = multistep_with_warmup(0.0025, steps_per_epoch=2000,
                                      milestones=(16, 19), gamma=0.1,
                                      warmup_iters=1000)
        assert float(sched(0)) == pytest.approx(0.0025 / 1000)
        assert float(sched(1000)) == pytest.approx(0.0025)
        assert float(sched(1999)) == pytest.approx(0.0025)
        # epoch 1: no warmup
        assert float(sched(2000)) == pytest.approx(0.0025)
        # epoch 16: one decay; epoch 19: two
        assert float(sched(16 * 2000)) == pytest.approx(0.00025)
        assert float(sched(19 * 2000 + 5)) == pytest.approx(0.000025)

    def test_short_epoch_warmup_cap(self):
        # warmup iters capped at steps_per_epoch - 1 (reference cald_train.py:49)
        sched = multistep_with_warmup(1.0, steps_per_epoch=10, warmup_iters=1000)
        assert float(sched(9)) == pytest.approx(1.0)


class TestOptimMask:
    def test_trainable_mask_paths(self):
        params = {"backbone": {"conv1": {"kernel": np.zeros(1)},
                               "layer1_0": {"conv1": {"kernel": np.zeros(1)}},
                               "layer2_0": {"conv1": {"kernel": np.zeros(1)}}},
                  "fpn": {"lateral0": {"kernel": np.zeros(1)}}}
        mask = trainable_mask(params, ("backbone/conv1", "backbone/layer1"))
        assert mask["backbone"]["conv1"]["kernel"] is False
        assert mask["backbone"]["layer1_0"]["conv1"]["kernel"] is False
        assert mask["backbone"]["layer2_0"]["conv1"]["kernel"] is True
        assert mask["fpn"]["lateral0"]["kernel"] is True

    def test_frozen_params_not_updated(self):
        import jax.numpy as jnp
        params = {"a": jnp.ones(3), "frozen_b": jnp.ones(3)}
        tx = make_sgd(0.1, momentum=0.9, weight_decay=1e-2, params=params,
                      frozen_prefixes=("frozen_b",))
        state = tx.init(params)
        grads = {"a": jnp.ones(3), "frozen_b": jnp.ones(3)}
        updates, _ = tx.update(grads, state, params)
        assert float(jnp.abs(updates["a"]).sum()) > 0
        assert float(jnp.abs(updates["frozen_b"]).sum()) == 0


class TestVOCAp:
    def test_perfect_detector(self):
        rec = np.array([0.5, 1.0])
        prec = np.array([1.0, 1.0])
        assert voc_ap(rec, prec) == pytest.approx(1.0)

    def test_half_precision(self):
        # 1 TP then 1 FP over 1 gt: rec [1, 1], prec [1, 0.5] -> AP = 1.0
        assert voc_ap(np.array([1.0, 1.0]), np.array([1.0, 0.5])) == pytest.approx(1.0)
        # 1 FP then 1 TP: rec [0, 1], prec [0, 0.5] -> AP = 0.5
        assert voc_ap(np.array([0.0, 1.0]), np.array([0.0, 0.5])) == pytest.approx(0.5)

    def test_11_point(self):
        ap = voc_ap(np.array([1.0]), np.array([1.0]), use_07_metric=True)
        assert ap == pytest.approx(1.0)


class TestVOCEvalClass:
    def test_greedy_tp_fp(self):
        gts = {"img0": (np.array([[0, 0, 10, 10.0]]), np.array([False]))}
        # two dets on the same gt: best-score one is TP, second is FP (dedup)
        dets = {"img0": (np.array([[0, 0, 10, 10.0], [1, 1, 11, 11.0]]),
                         np.array([0.9, 0.8]))}
        rec, prec, ap = voc_eval_class(dets, gts, 0.5)
        np.testing.assert_allclose(rec, [1.0, 1.0])
        np.testing.assert_allclose(prec, [1.0, 0.5])
        assert ap == pytest.approx(1.0)

    def test_difficult_neither_tp_nor_fp(self):
        gts = {"img0": (np.array([[0, 0, 10, 10.0]]), np.array([True]))}
        dets = {"img0": (np.array([[0, 0, 10, 10.0]]), np.array([0.9]))}
        rec, prec, ap = voc_eval_class(dets, gts, 0.5)
        # npos = 0 -> recall guarded; the difficult match is not an FP
        assert prec[0] == 0.0
        assert ap == 0.0

    def test_low_iou_is_fp(self):
        gts = {"img0": (np.array([[0, 0, 10, 10.0]]), np.array([False]))}
        dets = {"img0": (np.array([[20, 20, 30, 30.0]]), np.array([0.9]))}
        rec, prec, ap = voc_eval_class(dets, gts, 0.5)
        assert rec[-1] == 0.0 and ap == 0.0


class _FakeDataset:
    """Minimal dataset protocol for the evaluators."""

    def __init__(self, records, class_names):
        self._records = records
        self.class_names = class_names

    def __len__(self):
        return len(self._records)

    def record(self, i):
        return self._records[i]


def _rec(image_id, boxes, labels, difficult=None):
    from cald_tpu.data.records import ImageRecord
    boxes = np.asarray(boxes, np.float32).reshape(-1, 4)
    n = len(boxes)
    return ImageRecord(
        image_id=image_id, image_path="", width=100, height=100,
        boxes=boxes, labels=np.asarray(labels, np.int32),
        difficult=np.asarray(difficult if difficult is not None else [0] * n, np.int32))


class TestVOCEvaluate:
    def test_perfect_predictions_give_map_100(self, capsys):
        classes = ("__background__", "a", "b")
        recs = [_rec("0", [[0, 0, 10, 10], [20, 20, 40, 40]], [1, 2]),
                _rec("1", [[5, 5, 30, 30]], [1])]
        ds = _FakeDataset(recs, classes)
        results = [
            {"image_id": "0", "boxes": np.array([[0, 0, 10, 10], [20, 20, 40, 40.0]]),
             "scores": np.array([0.9, 0.8]), "labels": np.array([1, 2])},
            {"image_id": "1", "boxes": np.array([[5, 5, 30, 30.0]]),
             "scores": np.array([0.95]), "labels": np.array([1])},
        ]
        out = voc_evaluate_detections(results, ds)
        assert out["mAP"] == pytest.approx(1.0)
        assert out["AP50"] == pytest.approx(1.0)
        # 'recall' is the reference's mean over the cumulative recall CURVE
        # (voc_eval.py:249 rec_cls.append(np.mean(rec))): class a has curve
        # [0.5, 1.0] -> 0.75, class b [1.0] -> 1.0; mean 0.875.
        assert out["recall"] == pytest.approx(0.875)
        row = capsys.readouterr().out
        assert "100.0|100.0|100.0|87.5|100.0|100.0|" in row

    def test_wrong_class_scores_zero(self):
        classes = ("__background__", "a", "b")
        recs = [_rec("0", [[0, 0, 10, 10]], [1])]
        ds = _FakeDataset(recs, classes)
        results = [{"image_id": "0", "boxes": np.array([[0, 0, 10, 10.0]]),
                    "scores": np.array([0.9]), "labels": np.array([2])}]
        out = voc_evaluate_detections(results, ds, print_fn=lambda *a: None)
        assert out["mAP"] == 0.0


class TestCOCOEval:
    def test_iou_matrix_crowd(self):
        dets = np.array([[0, 0, 10, 10.0]])
        gts = np.array([[0, 0, 20, 20.0]])
        normal = iou_matrix(dets, gts, np.array([0]))
        crowd = iou_matrix(dets, gts, np.array([1]))
        assert normal[0, 0] == pytest.approx(100.0 / 400.0)
        assert crowd[0, 0] == pytest.approx(1.0)  # inter / det_area

    def test_perfect_predictions(self):
        classes = ("__background__", "a", "b")
        recs = [_rec("0", [[0, 0, 50, 50], [60, 60, 90, 90]], [1, 2]),
                _rec("1", [[5, 5, 45, 45]], [1])]
        ds = _FakeDataset(recs, classes)
        results = [
            {"image_id": "0", "boxes": np.array([[0, 0, 50, 50], [60, 60, 90, 90.0]]),
             "scores": np.array([0.9, 0.8]), "labels": np.array([1, 2])},
            {"image_id": "1", "boxes": np.array([[5, 5, 45, 45.0]]),
             "scores": np.array([0.95]), "labels": np.array([1])},
        ]
        stats = coco_evaluate_detections(results, ds, print_fn=lambda *a: None)
        assert stats["AP"] == pytest.approx(1.0)
        assert stats["AP50"] == pytest.approx(1.0)
        assert stats["AR100"] == pytest.approx(1.0)

    def test_half_iou_detection(self):
        """A det with IoU 0.5 < t for t > 0.5 counts only at low thresholds."""
        classes = ("__background__", "a")
        recs = [_rec("0", [[0, 0, 10, 20]], [1])]
        ds = _FakeDataset(recs, classes)
        # det covers exactly half the gt (IoU = 0.5)
        results = [{"image_id": "0", "boxes": np.array([[0, 0, 10, 10.0]]),
                    "scores": np.array([0.9]), "labels": np.array([1])}]
        stats = coco_evaluate_detections(results, ds, print_fn=lambda *a: None)
        # matches at IoU thr 0.5 only -> AP = 1/10 of sweep
        assert stats["AP50"] == pytest.approx(1.0)
        assert stats["AP75"] == pytest.approx(0.0)
        assert stats["AP"] == pytest.approx(0.1, abs=1e-6)

    def test_crowd_absorbs_many_dets(self):
        """Crowd-gt corner (pycocotools evaluateImg): a crowd gt may match ANY
        number of dets; those dets are IGNORED (neither TP nor FP), so a clean
        det on the real gt still yields perfect AP despite 2 extra dets inside
        the crowd region."""
        from cald_tpu.data.records import ImageRecord

        classes = ("__background__", "a")
        rec = ImageRecord(
            image_id="0", image_path="", width=100, height=100,
            boxes=np.array([[0, 0, 50, 50], [60, 0, 100, 40.0]], np.float32),
            labels=np.array([1, 1], np.int32),
            difficult=np.zeros(2, np.int32),
            iscrowd=np.array([0, 1], np.int32))
        ds = _FakeDataset([rec], classes)
        results = [{"image_id": "0",
                    "boxes": np.array([[0, 0, 50, 50],      # TP on the real gt
                                       [62, 2, 98, 38],     # inside the crowd
                                       [65, 5, 95, 35.0]]),  # also inside
                    "scores": np.array([0.9, 0.8, 0.7]),
                    "labels": np.array([1, 1, 1])}]
        stats = coco_evaluate_detections(results, ds, print_fn=lambda *a: None)
        # only 1 non-ignored gt; both crowd-matched dets ignored -> AP 1.0
        assert stats["AP"] == pytest.approx(1.0)
        assert stats["AR100"] == pytest.approx(1.0)

    def test_ignored_gt_preference_ordering(self):
        """Ignore-ordering corner: a det overlapping BOTH a non-ignored gt and
        a better-IoU area-ignored gt must take the non-ignored one (pycocotools
        sorts gts non-ignored-first and stops at the first ignored once a
        non-ignored match exists)."""
        from cald_tpu.data.records import ImageRecord

        classes = ("__background__", "a")
        # gt0 area 900 (< 32^2 -> 'small', non-ignored there); gt1 area 1156
        # (> 32^2 -> area-IGNORED in the 'small' range), heavily overlapping
        rec = ImageRecord(
            image_id="0", image_path="", width=100, height=100,
            boxes=np.array([[0, 0, 30, 30], [0, 0, 34, 34.0]], np.float32),
            labels=np.array([1, 1], np.int32),
            difficult=np.zeros(2, np.int32))
        ds = _FakeDataset([rec], classes)
        det = np.array([[0, 0, 33, 33.0]])
        results = [{"image_id": "0", "boxes": det,
                    "scores": np.array([0.9]), "labels": np.array([1])}]
        stats = coco_evaluate_detections(results, ds, print_fn=lambda *a: None)
        from cald_tpu.engine.coco_eval import IOU_THRS, iou_matrix

        iou0 = iou_matrix(det, rec.boxes[:1], np.zeros(1))[0, 0]  # ~0.826
        iou1 = iou_matrix(det, rec.boxes[1:], np.zeros(1))[0, 0]  # ~0.942
        assert iou0 > 0.5 and iou1 > iou0
        # 'all' range (both gts count): the det takes gt1 (higher IoU) where
        # thr <= iou1 -> 1 TP of 2 gts, precision 1.0 at recall 0.5 -> the 51
        # recall grid points <= 0.5 carry precision 1.0 (101-pt interpolation)
        n_all = int((IOU_THRS <= iou1 + 1e-9).sum())
        want_ap = (51 / 101) * n_all / len(IOU_THRS)
        assert stats["AP"] == pytest.approx(want_ap, abs=1e-6)
        # 'small' range: gt1 is ignored, so the det must PREFER non-ignored
        # gt0 despite the lower IoU wherever thr <= iou0 (-> recall 1.0 of the
        # single counted gt); above that it falls back to ignored gt1 (det
        # ignored, not FP); unmatched at 0.95 it is ALSO ignored (det area
        # 1089 is outside 'small') -> APs = fraction of thresholds <= iou0
        n_small = int((IOU_THRS <= iou0 + 1e-9).sum())
        assert stats["APs"] == pytest.approx(n_small / len(IOU_THRS), abs=1e-6)

    def test_classwise_table(self):
        classes = ("__background__", "a", "b")
        recs = [_rec("0", [[0, 0, 50, 50]], [1])]
        ds = _FakeDataset(recs, classes)
        results = [{"image_id": "0", "boxes": np.array([[0, 0, 50, 50.0]]),
                    "scores": np.array([0.9]), "labels": np.array([1])}]
        stats = coco_evaluate_detections(results, ds, classwise=True,
                                         print_fn=lambda *a: None)
        assert stats["per_class_ap"]["a"] == pytest.approx(1.0)
        assert np.isnan(stats["per_class_ap"]["b"])


class TestLogging:
    def test_smoothed_value(self):
        v = SmoothedValue(window_size=2)
        for x in (1.0, 2.0, 3.0):
            v.update(x)
        assert v.avg == pytest.approx(2.5)       # window (2, 3)
        assert v.global_avg == pytest.approx(2.0)
        assert v.max == 3.0 and v.value == 3.0

    def test_log_every_passthrough(self):
        lines = []
        ml = MetricLogger(print_fn=lines.append)
        out = list(ml.log_every([1, 2, 3], print_freq=1, header="H"))
        assert out == [1, 2, 3]
        assert any("[0/3]" in l for l in lines)


class TestViz:
    """Detection viz utilities (reference cald_helper.py:271-350 analog)."""

    def test_draw_and_save(self, tmp_path, rng):
        from cald_tpu.utils.viz import draw_detections, save_detection_image

        img = rng.uniform(0, 255, (40, 60, 3)).astype(np.uint8)
        boxes = np.array([[5, 5, 30, 30], [20, 10, 55, 35.0]])
        out = draw_detections(img, boxes, labels=[1, 2], scores=[0.9, 0.4],
                              class_names=("bg", "a", "b"), score_thresh=0.5)
        assert out.size == (60, 40)
        # the low-score box is skipped; the drawn one changed pixels
        assert not np.array_equal(np.asarray(out), img)
        p = tmp_path / "det.png"
        save_detection_image(str(p), img, boxes, labels=[1, 2])
        assert p.exists() and p.stat().st_size > 0
