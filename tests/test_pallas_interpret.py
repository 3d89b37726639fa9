"""Pallas kernel LOGIC parity on CPU via interpret mode.

The real kernels are TPU-only (test_pallas_roi_align / test_pallas_bottleneck
skip off-TPU), which left their schedule/indexing logic untested on this CPU
box. Interpret mode emulates the kernels (DMAs, semaphores, grids) without
Mosaic, so these tests pin the math — window planning, shrinking-halo
bookkeeping, multi-slot DMA schedules — everywhere. Mosaic-specific concerns
(layout legality, VMEM accounting) still need the TPU-backend tests.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental import pallas as pl


@pytest.fixture
def interpret_pallas(monkeypatch):
    orig = pl.pallas_call

    def patched(*args, **kwargs):
        kwargs["interpret"] = True
        return orig(*args, **kwargs)

    monkeypatch.setattr(pl, "pallas_call", patched)


def _pyramid(rng):
    shapes = [(80, 128), (40, 64), (20, 32), (10, 16)]
    feats = [jnp.asarray(rng.normal(0, 1, (h, w, 128)), jnp.float32)
             for h, w in shapes]
    return feats, [0.25, 0.125, 0.0625, 0.03125]


@pytest.mark.parametrize("nslots", ["2", "4"])
def test_roi_align_interpret_parity(rng, monkeypatch, interpret_pallas, nslots):
    from cald_tpu.ops.pallas_roi_align import pallas_multi_scale_roi_align
    from cald_tpu.ops.roi_align import multi_scale_roi_align

    monkeypatch.setenv("CALD_TPU_ROI_NSLOTS", nslots)
    feats, scales = _pyramid(rng)
    n = 24
    cx = rng.uniform(60, 440, n)
    cy = rng.uniform(50, 270, n)
    sz = rng.uniform(20, 150, n)
    ar = rng.uniform(0.5, 2.0, n)
    w_, h_ = sz * np.sqrt(ar), sz / np.sqrt(ar)
    rois = jnp.asarray(np.stack([cx - w_ / 2, cy - h_ / 2,
                                 cx + w_ / 2, cy + h_ / 2], -1), jnp.float32)
    ref = multi_scale_roi_align(feats, rois, spatial_scales=scales,
                                method="points")
    got = pallas_multi_scale_roi_align(feats, rois, spatial_scales=scales)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-4)


def test_roi_align_backward_interpret_parity(rng, interpret_pallas):
    """The custom_vjp scatter-windows backward vs autodiff of the points
    path — the read-add-write window accumulation logic, CPU-covered."""
    from cald_tpu.ops.pallas_roi_align import pallas_multi_scale_roi_align
    from cald_tpu.ops.roi_align import multi_scale_roi_align

    feats, scales = _pyramid(rng)
    n = 16
    cx = rng.uniform(60, 440, n)
    cy = rng.uniform(50, 270, n)
    sz = rng.uniform(20, 150, n)
    ar = rng.uniform(0.5, 2.0, n)
    w_, h_ = sz * np.sqrt(ar), sz / np.sqrt(ar)
    rois = jnp.asarray(np.stack([cx - w_ / 2, cy - h_ / 2,
                                 cx + w_ / 2, cy + h_ / 2], -1), jnp.float32)
    cot = jnp.asarray(rng.normal(0, 1, (n, 7, 7, 128)), jnp.float32)
    g_pal = jax.grad(lambda fs: jnp.sum(pallas_multi_scale_roi_align(
        fs, rois, spatial_scales=scales) * cot))(tuple(feats))
    g_pts = jax.grad(lambda fs: jnp.sum(multi_scale_roi_align(
        list(fs), rois, spatial_scales=scales, method="points") * cot))(
        tuple(feats))
    for a, b in zip(g_pal, g_pts):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def _xla_block(x, w1, b1, w2, b2, w3, b3):
    conv = lambda t, k: jax.lax.conv_general_dilated(
        t, k, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"))
    y = jnp.maximum(conv(x, w1[None, None]) + b1, 0)
    y = jnp.maximum(conv(y, w2) + b2, 0)
    y = conv(y, w3[None, None]) + b3
    return jnp.maximum(y + x, 0)


def test_fused_stage_deep_interpret_parity(rng, interpret_pallas):
    from cald_tpu.ops.pallas_bottleneck import maybe_fused_stage_deep

    h, w, c, p, n = 16, 32, 256, 64, 3
    mk = lambda *s: jnp.asarray(rng.normal(0, 0.08, s).astype(np.float32))
    blocks = [(mk(c, p), mk(p), mk(3, 3, p, p), mk(p), mk(p, c), mk(c))
              for _ in range(n)]
    x = jnp.asarray(rng.normal(0, 1, (2, h, w, c)).astype(np.float32))
    ref = x
    for blk in blocks:
        ref = _xla_block(ref, *blk)
    got = maybe_fused_stage_deep(x, blocks)
    assert got is not None
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=5e-5, rtol=1e-4)


@pytest.mark.parametrize("g,prec", [(2, "hi"), (4, "hi"), (4, "bf16")])
def test_roi_align_grouped_interpret_parity(rng, monkeypatch, interpret_pallas,
                                            g, prec):
    """CALD_TPU_ROI_GROUP=g runs the block-diagonal grouped-matmul forward
    (flat 2D levels, lane-granular size buckets). hi prec must match the
    points path exactly; bf16 within bf16-class tolerance. Roi count chosen
    to exercise the pad-to-multiple-of-g tail."""
    from cald_tpu.ops.pallas_roi_align import pallas_multi_scale_roi_align
    from cald_tpu.ops.roi_align import multi_scale_roi_align

    monkeypatch.setenv("CALD_TPU_ROI_GROUP", str(g))
    monkeypatch.setenv("CALD_TPU_ROI_GROUP_PREC", prec)
    feats, scales = _pyramid(rng)
    n = 19
    cx = rng.uniform(60, 440, n)
    cy = rng.uniform(50, 270, n)
    sz = rng.uniform(20, 150, n)
    ar = rng.uniform(0.5, 2.0, n)
    w_, h_ = sz * np.sqrt(ar), sz / np.sqrt(ar)
    rois = jnp.asarray(np.stack([cx - w_ / 2, cy - h_ / 2,
                                 cx + w_ / 2, cy + h_ / 2], -1), jnp.float32)
    ref = multi_scale_roi_align(feats, rois, spatial_scales=scales,
                                method="points")
    got = pallas_multi_scale_roi_align(feats, rois, spatial_scales=scales)
    atol = 1e-4 if prec == "hi" else 5e-2
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=atol)


def test_roi_align_grouped_backward_uses_standard_plan(rng, monkeypatch,
                                                       interpret_pallas):
    """Gradients through the grouped forward must match the points path: the
    custom_vjp backward always runs the standard scatter-windows plan."""
    from cald_tpu.ops.pallas_roi_align import pallas_multi_scale_roi_align
    from cald_tpu.ops.roi_align import multi_scale_roi_align

    monkeypatch.setenv("CALD_TPU_ROI_GROUP", "4")
    feats, scales = _pyramid(rng)
    n = 16
    cx = rng.uniform(60, 440, n)
    cy = rng.uniform(50, 270, n)
    sz = rng.uniform(20, 150, n)
    ar = rng.uniform(0.5, 2.0, n)
    w_, h_ = sz * np.sqrt(ar), sz / np.sqrt(ar)
    rois = jnp.asarray(np.stack([cx - w_ / 2, cy - h_ / 2,
                                 cx + w_ / 2, cy + h_ / 2], -1), jnp.float32)
    cot = jnp.asarray(rng.normal(0, 1, (n, 7, 7, 128)), jnp.float32)
    g_pal = jax.grad(lambda fs: jnp.sum(pallas_multi_scale_roi_align(
        fs, rois, spatial_scales=scales) * cot))(tuple(feats))
    g_pts = jax.grad(lambda fs: jnp.sum(multi_scale_roi_align(
        list(fs), rois, spatial_scales=scales, method="points") * cot))(
        tuple(feats))
    for a, b in zip(g_pal, g_pts):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)
