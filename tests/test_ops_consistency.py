"""CALD consistency kernel vs a NumPy transcription of the reference loop
(/root/reference/cald_train.py:184-228). This is the 1e-3 parity gate from
BASELINE.json, tested at 1e-5."""

import numpy as np
import scipy.stats
import jax.numpy as jnp

from cald_tpu.ops import cald_consistency
from cald_tpu.ops.consistency import class_correlation


def np_consistency(aug_boxes, ref_cls, ref_pm, ref_valid,
                   det_boxes, det_cls, det_pm, det_valid, bp):
    """Serial per-image reference scorer."""
    b, a, k, _ = aug_boxes.shape
    out = np.zeros(b)
    for bi in range(b):
        if not ref_valid[bi].any():
            out[bi] = 0.0
            continue
        per_aug = []
        for ai in range(a):
            dv = det_valid[bi, ai]
            if not dv.any():
                per_aug.append(0.0)
                continue
            boxes = det_boxes[bi, ai][dv]
            cls_rows = det_cls[bi, ai][dv]
            pms = det_pm[bi, ai][dv]
            consistency_img = 1.0
            for j in range(k):
                if not ref_valid[bi, j]:
                    continue
                ab = aug_boxes[bi, ai, j]
                width = np.minimum(ab[2], boxes[:, 2]) - np.maximum(ab[0], boxes[:, 0])
                height = np.minimum(ab[3], boxes[:, 3]) - np.maximum(ab[1], boxes[:, 1])
                Aarea = (ab[2] - ab[0]) * (ab[3] - ab[1])
                Barea = (boxes[:, 2] - boxes[:, 0]) * (boxes[:, 3] - boxes[:, 1])
                inter = width * height
                iou = inter / (Aarea + Barea - inter)
                iou[width < 0] = 0.0
                iou[height < 0] = 0.0
                best = int(np.argmax(iou))
                p = ref_cls[bi, j]
                q = cls_rows[best]
                m = (p + q) / 2
                js = 0.5 * scipy.stats.entropy(p, m) + 0.5 * scipy.stats.entropy(q, m)
                js = max(js, 0.0)
                val = abs(iou.max() + 0.5 * (1 - js) * (ref_pm[bi, j] + pms[best]) - bp)
                consistency_img = min(consistency_img, val)
            per_aug.append(consistency_img)
        out[bi] = np.mean(per_aug)
    return out


def make_case(rng, b=3, a=4, k=10, c=21):
    def boxes(shape):
        xy = rng.uniform(0, 200, shape + (2,))
        wh = rng.uniform(5, 100, shape + (2,))
        return np.concatenate([xy, xy + wh], -1).astype(np.float32)

    aug_boxes = boxes((b, a, k))
    det_boxes = boxes((b, a, k))
    ref_cls = rng.uniform(0.01, 1, (b, k, c)).astype(np.float32)
    det_cls = rng.uniform(0.01, 1, (b, a, k, c)).astype(np.float32)
    ref_pm = rng.uniform(0, 1, (b, k)).astype(np.float32)
    det_pm = rng.uniform(0, 1, (b, a, k)).astype(np.float32)
    ref_valid = rng.uniform(size=(b, k)) < 0.8
    ref_valid[:, 0] = True
    det_valid = rng.uniform(size=(b, a, k)) < 0.8
    return aug_boxes, ref_cls, ref_pm, ref_valid, det_boxes, det_cls, det_pm, det_valid


def test_consistency_matches_reference_loop(rng):
    case = make_case(rng)
    want = np_consistency(*case, bp=1.3)
    got = np.asarray(cald_consistency(*map(jnp.asarray, case), jnp.float32(1.3)))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_consistency_zero_when_no_ref_dets(rng):
    case = list(make_case(rng, b=2))
    case[3] = np.zeros_like(case[3])  # ref_valid all false
    got = np.asarray(cald_consistency(*map(jnp.asarray, case), jnp.float32(1.3)))
    np.testing.assert_allclose(got, 0.0)


def test_consistency_zero_det_aug_contributes_zero(rng):
    case = list(make_case(rng, b=1, a=2))
    case[7] = case[7].copy()
    case[7][0, 1] = False  # aug 1 has no detections
    want = np_consistency(*case, bp=1.3)
    got = np.asarray(cald_consistency(*map(jnp.asarray, case), jnp.float32(1.3)))
    np.testing.assert_allclose(got, want, rtol=1e-4)


def test_class_correlation(rng):
    scores = jnp.asarray([[0.9, 0.7, 0.3, 0.5]])
    labels = jnp.asarray([[1, 3, 1, 2]])
    valid = jnp.asarray([[True, True, True, False]])
    got = np.asarray(class_correlation(scores, labels, valid, 4))
    np.testing.assert_allclose(got, [[0.9, 0.0, 0.7, 0.0]])
