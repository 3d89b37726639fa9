"""RoIAlign parity against a serial NumPy port of the torchvision CPU kernel."""

import numpy as np
import jax.numpy as jnp

from cald_tpu.ops import multi_scale_roi_align, roi_align
from cald_tpu.ops.roi_align import fpn_level_assignment


def np_roi_align(feat_chw, rois, spatial_scale, out_size, sampling_ratio):
    """Serial reference of torchvision roi_align (aligned=False). feat: (C,H,W)."""
    c, h, w = feat_chw.shape
    n = len(rois)
    out = np.zeros((n, c, out_size, out_size), np.float64)

    def bilinear(ch, y, x):
        if y < -1.0 or y > h or x < -1.0 or x > w:
            return 0.0
        y = min(max(y, 0.0), h - 1)
        x = min(max(x, 0.0), w - 1)
        y0, x0 = int(np.floor(y)), int(np.floor(x))
        y1, x1 = min(y0 + 1, h - 1), min(x0 + 1, w - 1)
        ly, lx = y - y0, x - x0
        return (feat_chw[ch, y0, x0] * (1 - ly) * (1 - lx)
                + feat_chw[ch, y0, x1] * (1 - ly) * lx
                + feat_chw[ch, y1, x0] * ly * (1 - lx)
                + feat_chw[ch, y1, x1] * ly * lx)

    for r, roi in enumerate(rois):
        x1, y1, x2, y2 = roi * spatial_scale
        rw = max(x2 - x1, 1.0)
        rh = max(y2 - y1, 1.0)
        bw, bh = rw / out_size, rh / out_size
        for ch in range(c):
            for i in range(out_size):
                for j in range(out_size):
                    acc = 0.0
                    for iy in range(sampling_ratio):
                        for ix in range(sampling_ratio):
                            y = y1 + i * bh + (iy + 0.5) * bh / sampling_ratio
                            x = x1 + j * bw + (ix + 0.5) * bw / sampling_ratio
                            acc += bilinear(ch, y, x)
                    out[r, ch, i, j] = acc / (sampling_ratio ** 2)
    return out


def test_roi_align_matches_serial_reference(rng):
    feat = rng.normal(0, 1, (3, 16, 20)).astype(np.float32)  # (C,H,W)
    rois = np.array([
        [4.0, 4.0, 40.0, 28.0],
        [0.0, 0.0, 80.0, 64.0],
        [10.0, 6.0, 14.0, 9.0],     # tiny roi
        [-8.0, -8.0, 30.0, 30.0],   # partially outside
    ], np.float32)
    want = np_roi_align(feat, rois, 0.25, 7, 2)
    got = roi_align(jnp.asarray(feat.transpose(1, 2, 0)), jnp.asarray(rois),
                    spatial_scale=0.25, output_size=7, sampling_ratio=2)
    got = np.asarray(got).transpose(0, 3, 1, 2)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_roi_align_chunking_consistent(rng):
    feat = rng.normal(0, 1, (12, 12, 4)).astype(np.float32)
    rois = rng.uniform(0, 40, (37, 2))
    rois = np.concatenate([rois, rois + rng.uniform(4, 20, (37, 2))], 1).astype(np.float32)
    a = roi_align(jnp.asarray(feat), jnp.asarray(rois), spatial_scale=0.25,
                  chunk_size=8)
    b = roi_align(jnp.asarray(feat), jnp.asarray(rois), spatial_scale=0.25,
                  chunk_size=64)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6)


def test_fpn_level_assignment():
    rois = jnp.asarray([
        [0, 0, 32, 32],      # sqrt(area)=32  -> k=4+log2(32/224)= ~1.2 -> clamp 2 -> idx 0
        [0, 0, 112, 112],    # 112 -> k=3 -> idx 1
        [0, 0, 224, 224],    # 224 -> k=4 -> idx 2
        [0, 0, 448, 448],    # 448 -> k=5 -> idx 3
        [0, 0, 2000, 2000],  # clamp at 5 -> idx 3
    ], dtype=jnp.float32)
    got = list(np.asarray(fpn_level_assignment(rois)))
    assert got == [0, 1, 2, 3, 3]


def test_multi_scale_equals_single_level_for_assigned_rois(rng):
    feats = [jnp.asarray(rng.normal(0, 1, (32 // (2 ** i), 32 // (2 ** i), 4)).astype(np.float32))
             for i in range(4)]
    scales = [1 / 4, 1 / 8, 1 / 16, 1 / 32]
    rois = jnp.asarray([[0, 0, 40, 40], [0, 0, 230, 220]], dtype=jnp.float32)
    lvls = list(np.asarray(fpn_level_assignment(rois)))
    out = multi_scale_roi_align(feats, rois, spatial_scales=scales)
    for i, lvl in enumerate(lvls):
        single = roi_align(feats[lvl], rois[i:i + 1], spatial_scale=scales[lvl])
        # atol absorbs f32 fusion-order noise (differs across XLA CPU topologies)
        np.testing.assert_allclose(np.asarray(out[i]), np.asarray(single[0]),
                                   rtol=1e-5, atol=1e-6)
