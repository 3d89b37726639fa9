"""Unit tests for box geometry kernels against plain NumPy references."""

import numpy as np
import jax.numpy as jnp

from cald_tpu.ops import (
    area, box_iou, clip_boxes, decode_boxes, encode_boxes, intersect,
    pairwise_iou_nocheck, remove_small_boxes_mask,
)


def random_boxes(rng, n, size=100.0):
    xy = rng.uniform(0, size, (n, 2))
    wh = rng.uniform(1, size / 2, (n, 2))
    return np.concatenate([xy, xy + wh], axis=1).astype(np.float32)


def np_iou(b1, b2):
    n1, n2 = len(b1), len(b2)
    out = np.zeros((n1, n2), np.float64)
    for i in range(n1):
        for j in range(n2):
            ix = max(0.0, min(b1[i, 2], b2[j, 2]) - max(b1[i, 0], b2[j, 0]))
            iy = max(0.0, min(b1[i, 3], b2[j, 3]) - max(b1[i, 1], b2[j, 1]))
            inter = ix * iy
            a1 = (b1[i, 2] - b1[i, 0]) * (b1[i, 3] - b1[i, 1])
            a2 = (b2[j, 2] - b2[j, 0]) * (b2[j, 3] - b2[j, 1])
            u = a1 + a2 - inter
            out[i, j] = inter / u if u > 0 else 0.0
    return out


def test_iou_matrix_matches_numpy(rng):
    b1 = random_boxes(rng, 17)
    b2 = random_boxes(rng, 23)
    got = np.asarray(box_iou(jnp.asarray(b1), jnp.asarray(b2)))
    np.testing.assert_allclose(got, np_iou(b1, b2), rtol=1e-5, atol=1e-6)


def test_intersect_matches_numpy(rng):
    b1 = random_boxes(rng, 5)
    b2 = random_boxes(rng, 9)
    got = np.asarray(intersect(jnp.asarray(b1), jnp.asarray(b2)))
    want = np.zeros((5, 9))
    for i in range(5):
        for j in range(9):
            ix = max(0.0, min(b1[i, 2], b2[j, 2]) - max(b1[i, 0], b2[j, 0]))
            iy = max(0.0, min(b1[i, 3], b2[j, 3]) - max(b1[i, 1], b2[j, 1]))
            want[i, j] = ix * iy
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_pairwise_iou_nocheck_matches_reference_formula(rng):
    """Mirrors /root/reference/cald_train.py:203-210 computed in NumPy."""
    ref = random_boxes(rng, 1)[0]
    boxes = random_boxes(rng, 31)
    width = np.minimum(ref[2], boxes[:, 2]) - np.maximum(ref[0], boxes[:, 0])
    height = np.minimum(ref[3], boxes[:, 3]) - np.maximum(ref[1], boxes[:, 1])
    a = (ref[2] - ref[0]) * (ref[3] - ref[1])
    b = (boxes[:, 2] - boxes[:, 0]) * (boxes[:, 3] - boxes[:, 1])
    inter = width * height
    want = inter / (a + b - inter)
    want[width < 0] = 0.0
    want[height < 0] = 0.0
    got = np.asarray(pairwise_iou_nocheck(jnp.asarray(ref), jnp.asarray(boxes)))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_encode_decode_roundtrip(rng):
    props = random_boxes(rng, 40)
    gts = random_boxes(rng, 40)
    w = (10.0, 10.0, 5.0, 5.0)
    deltas = encode_boxes(jnp.asarray(gts), jnp.asarray(props), weights=w)
    back = decode_boxes(deltas, jnp.asarray(props), weights=w)
    np.testing.assert_allclose(np.asarray(back), gts, rtol=1e-4, atol=1e-3)


def test_decode_class_specific_shape(rng):
    props = jnp.asarray(random_boxes(rng, 12))
    deltas = jnp.asarray(rng.normal(0, 0.1, (12, 21, 4)).astype(np.float32))
    out = decode_boxes(deltas, props)
    assert out.shape == (12, 21, 4)
    # class c deltas decode identically to the flat call
    flat = decode_boxes(deltas[:, 3, :], props)
    np.testing.assert_allclose(np.asarray(out[:, 3]), np.asarray(flat), rtol=1e-6)


def test_clip_and_small_mask():
    boxes = jnp.asarray([[-5.0, -5.0, 50.0, 200.0], [10.0, 10.0, 12.0, 11.0]])
    clipped = clip_boxes(boxes, (100, 60))
    np.testing.assert_allclose(np.asarray(clipped),
                               [[0, 0, 50, 100], [10, 10, 12, 11]])
    mask = remove_small_boxes_mask(clipped, 3.0)
    assert list(np.asarray(mask)) == [True, False]
    np.testing.assert_allclose(np.asarray(area(clipped)), [5000.0, 2.0])
