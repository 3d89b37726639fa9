"""Pallas NMS kernel parity vs the XLA tiled suppression (TPU only — the
kernel needs real Mosaic; the XLA path is the tested fallback elsewhere).

The kernel is opt-in (CALD_TPU_PALLAS_NMS=1): throughput matches the XLA
tiled loop inside the fused scoring program, and Mosaic currently rejects it
under wide vmap batches on the v5e remote-compile path."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

tpu_only = pytest.mark.skipif(jax.default_backend() not in ("tpu", "axon"),
                              reason="needs a TPU backend")


def _np_greedy_nms(boxes, alive, thresh):
    k = len(boxes)
    keep = alive.copy()
    for i in range(k):
        if not keep[i]:
            continue
        for j in range(i + 1, k):
            if not keep[j]:
                continue
            x1 = max(boxes[i, 0], boxes[j, 0])
            y1 = max(boxes[i, 1], boxes[j, 1])
            x2 = min(boxes[i, 2], boxes[j, 2])
            y2 = min(boxes[i, 3], boxes[j, 3])
            iw, ih = max(x2 - x1, 0), max(y2 - y1, 0)
            inter = iw * ih
            a = (boxes[i, 2] - boxes[i, 0]) * (boxes[i, 3] - boxes[i, 1])
            b = (boxes[j, 2] - boxes[j, 0]) * (boxes[j, 3] - boxes[j, 1])
            union = a + b - inter
            if union > 0 and inter / union > thresh:
                keep[j] = False
    return keep


@tpu_only
@pytest.mark.parametrize("k,seed", [(128, 0), (256, 1), (512, 2)])
def test_pallas_matches_xla_and_numpy(k, seed):
    from cald_tpu.ops.nms import _tiled_suppression
    from cald_tpu.ops.pallas_nms import pallas_suppression

    rng = np.random.default_rng(seed)
    xy = rng.uniform(0, 80, (k, 2))
    wh = rng.uniform(5, 40, (k, 2))
    boxes = np.concatenate([xy, xy + wh], -1).astype(np.float32)
    alive = rng.random(k) > 0.1

    got_pl = np.asarray(pallas_suppression(jnp.asarray(boxes),
                                           jnp.asarray(alive), 0.5))
    got_xla = np.asarray(_tiled_suppression(jnp.asarray(boxes),
                                            jnp.asarray(alive), 0.5))
    want = _np_greedy_nms(boxes, alive, 0.5)
    np.testing.assert_array_equal(got_xla, want)
    np.testing.assert_array_equal(got_pl, want)
