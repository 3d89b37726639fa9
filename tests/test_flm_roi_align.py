"""Full-level-matmul RoIAlign parity vs the pointwise XLA path.

Interpret-mode tests pin the slot plan + kernel math on CPU; the TPU-marked
test checks the real Mosaic lowering (bf16 fast mode tolerance matches the
grouped kernel's measured points-path delta).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

tpu_only = pytest.mark.skipif(jax.default_backend() not in ("tpu", "axon"),
                              reason="needs a TPU backend")


def _pyramid(rng, b, shapes=((80, 128), (40, 64), (20, 32), (10, 16)), c=128):
    feats = [jnp.asarray(rng.normal(0, 1, (b, h, w, c)), jnp.float32)
             for h, w in shapes]
    scales = [0.25 / (2 ** i) for i in range(len(shapes))]
    return feats, scales


def _rois(rng, b, n, img_wh=(512, 320), ar_max=2.0):
    cx = rng.uniform(30, img_wh[0] - 30, (b, n))
    cy = rng.uniform(30, img_wh[1] - 30, (b, n))
    sz = rng.uniform(8, 280, (b, n))
    ar = rng.uniform(1 / ar_max, ar_max, (b, n))
    w = sz * np.sqrt(ar)
    h = sz / np.sqrt(ar)
    return jnp.asarray(np.stack([cx - w / 2, cy - h / 2, cx + w / 2, cy + h / 2],
                                -1), jnp.float32)


def _check(feats, scales, rois, valid, *, group=8, atol=1e-4, hi_prec=True,
           interpret=True):
    # atol 1e-4: the kernel's W-tiled x-contraction accumulates partial dots
    # in a different f32 order than the points path's single contraction
    from cald_tpu.ops.flm_roi_align import flm_multi_scale_roi_align
    from cald_tpu.ops.roi_align import multi_scale_roi_align

    pooled, slot = jax.jit(lambda f, r, v: flm_multi_scale_roi_align(
        f, r, v, spatial_scales=scales, group=group, hi_prec=hi_prec,
        interpret=interpret))(feats, rois, valid)
    got = jnp.take_along_axis(
        pooled, slot[:, :, None, None, None], axis=1)        # (B, N, 7, 7, C)
    ref = jax.vmap(lambda *fr: multi_scale_roi_align(
        list(fr[:-1]), fr[-1], spatial_scales=scales, method="points"))(
        *feats, rois)
    v = np.asarray(valid)
    np.testing.assert_allclose(np.asarray(got)[v], np.asarray(ref)[v],
                               atol=atol, rtol=0)
    # invalid rois map to the shared zero slot
    if (~v).any():
        assert np.abs(np.asarray(got)[~v]).max() == 0.0
    return np.asarray(slot)


def test_parity_all_valid(rng):
    feats, scales = _pyramid(rng, b=2)
    rois = _rois(rng, 2, 40)
    _check(feats, scales, rois, jnp.ones((2, 40), bool))


def test_parity_with_invalid_slots(rng):
    feats, scales = _pyramid(rng, b=2)
    rois = _rois(rng, 2, 40)
    # zero boxes in padded slots, like real padded proposals
    valid = jnp.asarray(rng.uniform(size=(2, 40)) > 0.5)
    rois = jnp.where(valid[..., None], rois, 0.0)
    slot = _check(feats, scales, rois, valid)
    # every valid roi gets a distinct slot
    for b in range(2):
        s = slot[b][np.asarray(valid[b])]
        assert len(set(s.tolist())) == len(s)


def test_parity_border_and_extreme_rois(rng):
    feats, scales = _pyramid(rng, b=1)
    # border-crossing, tiny, degenerate, huge, and out-of-image rois
    rois = jnp.asarray([[
        [-20.0, -10.0, 60.0, 50.0],      # crosses the top-left border
        [500.0, 300.0, 560.0, 360.0],    # crosses bottom-right
        [100.0, 100.0, 100.5, 100.5],    # sub-pixel
        [0.0, 0.0, 512.0, 320.0],        # whole image (coarsest level)
        [480.0, 10.0, 680.0, 40.0],      # extends past the right edge
        [5.0, 5.0, 6.0, 300.0],          # extreme aspect ratio
    ]], jnp.float32)
    _check(feats, scales, rois, jnp.ones((1, 6), bool))


def test_parity_single_level_occupancy(rng):
    """All rois land on one level: other level regions are empty (cap 0)."""
    feats, scales = _pyramid(rng, b=1)
    n = 24
    cx = rng.uniform(60, 440, (1, n))
    cy = rng.uniform(50, 270, (1, n))
    sz = rng.uniform(30, 40, (1, n))     # sqrt(area) ~ 30-40 -> single level
    rois = jnp.asarray(np.stack([cx - sz / 2, cy - sz / 2,
                                 cx + sz / 2, cy + sz / 2], -1), jnp.float32)
    _check(feats, scales, rois, jnp.ones((1, n), bool))


def test_parity_group_sizes(rng):
    feats, scales = _pyramid(rng, b=1)
    rois = _rois(rng, 1, 21)             # not a multiple of either group
    for g in (4, 16):
        _check(feats, scales, rois, jnp.ones((1, 21), bool), group=g)


def test_parity_single_level_pyramid(rng):
    """MobileNet-style single-level 'pyramid' degrades gracefully."""
    feats = [jnp.asarray(rng.normal(0, 1, (1, 40, 64, 128)), jnp.float32)]
    rois = _rois(rng, 1, 12)
    _check(feats, [1 / 16], rois, jnp.ones((1, 12), bool))


def test_parity_coco_canvas_widths(rng):
    """Non-power-of-two level widths (COCO 800x1344 canvas -> 336/168/84/42):
    the W-tile must pick a proper divisor (28/28/28/21 at wtile 32), not fall
    back to the full-width Mosaic compile cliff. Shrunk rows, real widths."""
    shapes = ((42, 336), (21, 168), (11, 84), (6, 42))
    feats = [jnp.asarray(rng.normal(0, 1, (1, h, w, 128)), jnp.float32)
             for h, w in shapes]
    scales = [0.25 / (2 ** i) for i in range(4)]
    rois = _rois(rng, 1, 20, img_wh=(1300, 160))
    _check(feats, scales, rois, jnp.ones((1, 20), bool))


def test_wtile_divisor_choice():
    """The static tile-width rule: largest divisor <= wtile, single-tile
    fallback below 8 (mirrors the kernel's trace-time computation)."""
    def pick(w_l, wtile=32):
        wt = max(d for d in range(1, min(w_l, wtile) + 1) if w_l % d == 0)
        return w_l if wt < 8 else wt

    assert pick(256) == 32 and pick(336) == 28 and pick(168) == 28
    assert pick(84) == 28 and pick(42) == 21 and pick(16) == 16
    assert pick(41) == 41          # prime width: single tile, no 1-wide unroll


def test_all_invalid(rng):
    from cald_tpu.ops.flm_roi_align import flm_multi_scale_roi_align

    feats, scales = _pyramid(rng, b=1)
    rois = jnp.zeros((1, 8, 4), jnp.float32)
    pooled, slot = flm_multi_scale_roi_align(
        feats, rois, jnp.zeros((1, 8), bool), spatial_scales=scales,
        group=4, hi_prec=True, interpret=True)
    got = jnp.take_along_axis(pooled, slot[:, :, None, None, None], axis=1)
    assert np.abs(np.asarray(got)).max() == 0.0


@tpu_only
def test_tpu_parity_bf16(rng):
    """Real Mosaic lowering, bf16 fast mode (the scoring configuration)."""
    feats, scales = _pyramid(
        rng, b=2, shapes=((160, 256), (80, 128), (40, 64), (20, 32)), c=256)
    feats_b = [f.astype(jnp.bfloat16) for f in feats]
    rois = _rois(rng, 2, 96, img_wh=(1000, 600))
    valid = jnp.asarray(rng.uniform(size=(2, 96)) > 0.3)
    rois = jnp.where(valid[..., None], rois, 0.0)

    from cald_tpu.ops.flm_roi_align import flm_multi_scale_roi_align
    from cald_tpu.ops.roi_align import multi_scale_roi_align

    pooled, slot = jax.jit(lambda f, r, v: flm_multi_scale_roi_align(
        f, r, v, spatial_scales=scales, group=8))(feats_b, rois, valid)
    got = jnp.take_along_axis(pooled, slot[:, :, None, None, None], axis=1)
    ref = jax.vmap(lambda *fr: multi_scale_roi_align(
        list(fr[:-1]), fr[-1], spatial_scales=scales, method="points"))(
        *feats, rois)
    v = np.asarray(valid)
    err = np.abs(np.asarray(got)[v] - np.asarray(ref)[v]).max()
    # bf16 features + bf16 weights vs the f32 points path: the grouped
    # kernel's measured delta at this config is ~1e-2 (PERF.md round 4)
    assert err < 5e-2, err
