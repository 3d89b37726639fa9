"""RetinaNet postprocess golden parity (VERDICT round-1 item 2, retina leg).

A literal numpy transcription of the reference's RetinaNet eval postprocess
(/root/reference/detection/retinanet_cal.py:402-488: decode ALL anchors,
per-class loop — score>0.05 filter, remove_small 1e-2, NMS 0.5, per-class cap
— emitting prob_max over all classes and full sigmoid rows) is compared
against the fixed-shape TPU path on identical (logits, regressions, anchors).

The fixture stays inside the documented deviation envelope (models/
retinanet.py docstring): per-level candidate counts below topk_candidates and
survivors below both the per-class and global caps, where the torchvision-0.8
semantics and the modern fixed-shape semantics provably coincide.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from cald_tpu.models.retinanet import retinanet_postprocess
from tests.test_ops_nms import np_nms

BBOX_XFORM_CLIP = np.log(1000.0 / 16.0)


def np_decode(deltas, anchors):
    w = anchors[:, 2] - anchors[:, 0]
    h = anchors[:, 3] - anchors[:, 1]
    cx = anchors[:, 0] + 0.5 * w
    cy = anchors[:, 1] + 0.5 * h
    dx, dy = deltas[:, 0], deltas[:, 1]
    dw = np.minimum(deltas[:, 2], BBOX_XFORM_CLIP)
    dh = np.minimum(deltas[:, 3], BBOX_XFORM_CLIP)
    pcx, pcy = dx * w + cx, dy * h + cy
    pw, ph = np.exp(dw) * w, np.exp(dh) * h
    return np.stack([pcx - pw / 2, pcy - ph / 2, pcx + pw / 2, pcy + ph / 2], 1)


def golden_retina_postprocess(logits, regs, anchors, hw, *, score_thresh=0.05,
                              nms_thresh=0.5, detections_per_img=300,
                              min_size=1e-2):
    """retinanet_cal.py:402-488, shape-dynamic numpy (+ the documented
    canvas-independence mask: anchors centered on canvas padding are not
    candidates — models/retinanet.py retinanet_postprocess, PARITY.md)."""
    scores = 1.0 / (1.0 + np.exp(-logits))                     # (N, C) sigmoid
    cxy = (anchors[:, :2] + anchors[:, 2:]) / 2.0
    inside = (cxy[:, 0] < hw[1]) & (cxy[:, 1] < hw[0])
    scores = scores * inside[:, None]
    boxes = np_decode(regs, anchors)
    boxes[:, [0, 2]] = boxes[:, [0, 2]].clip(0, hw[1])
    boxes[:, [1, 3]] = boxes[:, [1, 3]].clip(0, hw[0])
    out = []
    c = scores.shape[1]
    # the reference's class loop includes channel 0; that channel is trained
    # toward zero for every anchor (one-hot targets use labels 1..20), so
    # above-threshold channel-0 detections exist only for untrained heads.
    # The TPU path excludes label 0 by construction (retinanet.py:184) — the
    # transcription follows classes 1..C-1, the behavioral envelope.
    for cls in range(1, c):
        inds = scores[:, cls] > score_thresh
        b, s, rows = boxes[inds], scores[inds, cls], scores[inds]
        pm = rows.max(1) if inds.any() else np.zeros((0,))
        keep = (b[:, 2] - b[:, 0] >= min_size) & (b[:, 3] - b[:, 1] >= min_size)
        b, s, rows, pm = b[keep], s[keep], rows[keep], pm[keep]
        keep = np_nms(b, s, nms_thresh)[:detections_per_img]
        for i in keep:
            out.append((float(s[i]), cls, b[i], rows[i], float(pm[i])))
    return sorted(out, key=lambda t: -t[0])


@pytest.mark.parametrize("seed", [0, 1])
def test_retina_postprocess_matches_reference_transcription(rng, seed):
    r = np.random.default_rng(seed)
    # two levels, small counts: candidates far below topk_candidates and caps
    level_counts = (24, 12)
    n = sum(level_counts)
    c = 5
    # most logits deeply negative (sigmoid ~ 0), a few boosted above 0.05
    logits = r.normal(-6.0, 1.0, (n, c)).astype(np.float32)
    hot = r.choice(n * c, 30, replace=False)
    logits.reshape(-1)[hot] = r.normal(0.5, 1.5, 30).astype(np.float32)
    regs = r.normal(0, 0.15, (n, 4)).astype(np.float32)
    # a handful of anchors centered beyond valid_hw (canvas padding) exercise
    # the canvas-independence candidate mask on both paths
    xy = r.uniform(4, 120, (n, 2))
    wh = r.uniform(8, 24, (n, 2))
    anchors = np.concatenate([xy, xy + wh], 1).astype(np.float32)
    hw = np.asarray([96, 112], np.int32)

    golden = golden_retina_postprocess(logits, regs, anchors, hw)
    # guard: fixture must produce real work and unique scores (stable pairing)
    assert len(golden) > 4
    gs = [g[0] for g in golden]
    assert len(set(np.round(gs, 6))) == len(gs)

    dets = jax.jit(lambda lg, rg, an, h: retinanet_postprocess(
        lg, rg, an, level_counts, h, score_thresh=0.05, nms_thresh=0.5,
        detections_per_img=64, topk_candidates=n * c))(
        jnp.asarray(logits), jnp.asarray(regs), jnp.asarray(anchors),
        jnp.asarray(hw))

    v = np.asarray(dets.valid).astype(bool)
    assert int(v.sum()) == len(golden), (int(v.sum()), len(golden))
    order = np.argsort(-np.asarray(dets.scores)[v], kind="stable")
    got_scores = np.asarray(dets.scores)[v][order]
    got_labels = np.asarray(dets.labels)[v][order]
    got_boxes = np.asarray(dets.boxes)[v][order]
    got_rows = np.asarray(dets.scores_cls)[v][order]
    got_pm = np.asarray(dets.prob_max)[v][order]
    for i, (s, cls, b, rows, pm) in enumerate(golden):
        assert got_scores[i] == pytest.approx(s, abs=2e-5)
        assert int(got_labels[i]) == cls
        np.testing.assert_allclose(got_boxes[i], b, atol=1e-2)
        np.testing.assert_allclose(got_rows[i], rows, atol=2e-5)
        assert got_pm[i] == pytest.approx(pm, abs=2e-5)
