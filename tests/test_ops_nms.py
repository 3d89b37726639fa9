"""NMS parity tests against a serial NumPy reference (torchvision semantics)."""

import numpy as np
import jax.numpy as jnp

from cald_tpu.ops import batched_nms, nms
from tests.test_ops_boxes import np_iou, random_boxes


def np_nms(boxes, scores, thresh):
    """Serial greedy NMS: suppress IoU strictly greater than thresh."""
    order = np.argsort(-scores, kind="stable")
    keep, suppressed = [], np.zeros(len(boxes), bool)
    iou = np_iou(boxes, boxes)
    for i in order:
        if suppressed[i]:
            continue
        keep.append(i)
        suppressed |= iou[i] > thresh
        suppressed[i] = True
    return keep


def test_nms_matches_serial_reference(rng):
    for trial in range(5):
        boxes = random_boxes(rng, 60, size=40.0)  # small canvas -> many overlaps
        scores = rng.uniform(0, 1, 60).astype(np.float32)
        want = np_nms(boxes, scores, 0.5)
        idx, valid = nms(jnp.asarray(boxes), jnp.asarray(scores),
                         iou_threshold=0.5, max_outputs=60)
        got = list(np.asarray(idx)[np.asarray(valid)])
        assert got == want, f"trial {trial}"


def test_nms_max_outputs_truncates(rng):
    boxes = random_boxes(rng, 50, size=500.0)  # spread out -> few suppressions
    scores = rng.uniform(0, 1, 50).astype(np.float32)
    want = np_nms(boxes, scores, 0.5)[:10]
    idx, valid = nms(jnp.asarray(boxes), jnp.asarray(scores),
                     iou_threshold=0.5, max_outputs=10)
    assert np.asarray(valid).sum() == 10
    assert list(np.asarray(idx)) == want


def test_nms_respects_valid_mask(rng):
    boxes = random_boxes(rng, 30, size=40.0)
    scores = rng.uniform(0, 1, 30).astype(np.float32)
    valid = np.zeros(30, bool)
    valid[:15] = True
    want = np_nms(boxes[:15], scores[:15], 0.5)
    idx, keep_valid = nms(jnp.asarray(boxes), jnp.asarray(scores),
                          iou_threshold=0.5, max_outputs=30,
                          valid=jnp.asarray(valid))
    got = list(np.asarray(idx)[np.asarray(keep_valid)])
    assert got == want


def test_batched_nms_is_per_class(rng):
    boxes = np.tile(random_boxes(rng, 12, size=30.0), (2, 1))  # duplicate boxes
    scores = rng.uniform(0, 1, 24).astype(np.float32)
    labels = np.array([1] * 12 + [2] * 12)
    idx, valid = batched_nms(jnp.asarray(boxes), jnp.asarray(scores),
                             jnp.asarray(labels), iou_threshold=0.5, max_outputs=24)
    got = set(np.asarray(idx)[np.asarray(valid)].tolist())
    want = set(np_nms(boxes[:12], scores[:12], 0.5)) | \
        {i + 12 for i in np_nms(boxes[12:], scores[12:], 0.5)}
    assert got == want
    # identical boxes with different labels never suppress one another
    assert any(i in got and i + 12 in got for i in range(12))


def test_nms_pre_nms_size_cap(rng):
    boxes = random_boxes(rng, 100, size=40.0)
    scores = rng.uniform(0, 1, 100).astype(np.float32)
    top = np.argsort(-scores, kind="stable")[:32]
    want = [int(top[i]) for i in np_nms(boxes[top], scores[top], 0.5)]
    idx, valid = nms(jnp.asarray(boxes), jnp.asarray(scores), iou_threshold=0.5,
                     max_outputs=32, pre_nms_size=32)
    got = list(np.asarray(idx)[np.asarray(valid)])
    assert got == want
