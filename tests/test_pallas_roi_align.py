"""Pallas window-DMA RoIAlign parity vs the pointwise XLA path (TPU only)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

tpu_only = pytest.mark.skipif(jax.default_backend() not in ("tpu", "axon"),
                              reason="needs a TPU backend")


def _pyramid(rng, b=None):
    shapes = [(160, 256), (80, 128), (40, 64), (20, 32)]
    # C must be a multiple of 128 (Mosaic lane-aligned reshapes); FPN uses 256
    mk = lambda h, w: rng.normal(0, 1, ((b,) if b else ()) + (h, w, 128)).astype(np.float32)
    return [jnp.asarray(mk(h, w)) for h, w in shapes], [0.25, 0.125, 0.0625, 0.03125]


def _rois(rng, n, b=None, ar_max=2.0):
    shape = ((b,) if b else ()) + (n,)
    cx = rng.uniform(100, 900, shape)
    cy = rng.uniform(80, 560, shape)
    sz = rng.uniform(20, 300, shape)
    ar = rng.uniform(1 / ar_max, ar_max, shape)
    w = sz * np.sqrt(ar)
    h = sz / np.sqrt(ar)
    return jnp.asarray(np.stack([cx - w / 2, cy - h / 2, cx + w / 2, cy + h / 2],
                                -1), jnp.float32)


@tpu_only
def test_exact_parity_within_envelope(rng):
    from cald_tpu.ops.pallas_roi_align import pallas_multi_scale_roi_align
    from cald_tpu.ops.roi_align import multi_scale_roi_align

    feats, scales = _pyramid(rng)
    rois = _rois(rng, 256)
    ref = multi_scale_roi_align(feats, rois, spatial_scales=scales, method="points")
    got = pallas_multi_scale_roi_align(feats, rois, spatial_scales=scales)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-3)


@tpu_only
def test_vmapped_over_batch(rng):
    from cald_tpu.ops.pallas_roi_align import pallas_multi_scale_roi_align
    from cald_tpu.ops.roi_align import multi_scale_roi_align

    feats, scales = _pyramid(rng, b=3)
    rois = _rois(rng, 64, b=3)
    f = jax.jit(jax.vmap(lambda f0, f1, f2, f3, r: pallas_multi_scale_roi_align(
        [f0, f1, f2, f3], r, spatial_scales=scales)))
    got = f(*feats, rois)
    ref = jax.vmap(lambda f0, f1, f2, f3, r: multi_scale_roi_align(
        [f0, f1, f2, f3], r, spatial_scales=scales, method="points"))(*feats, rois)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-3)


@tpu_only
@pytest.mark.parametrize("nslots", [4, 8])
def test_deeper_dma_pipeline_parity(rng, nslots, monkeypatch):
    """CALD_TPU_ROI_NSLOTS>2 keeps several window copies outstanding; the
    schedule change must be invisible in the output."""
    import cald_tpu.ops.pallas_roi_align as pra

    monkeypatch.setenv("CALD_TPU_ROI_NSLOTS", str(nslots))
    feats, scales = _pyramid(rng)
    rois = _rois(rng, 96)
    got = pra.pallas_multi_scale_roi_align(feats, rois, spatial_scales=scales)
    monkeypatch.setenv("CALD_TPU_ROI_NSLOTS", "2")
    ref = pra.pallas_multi_scale_roi_align(feats, rois, spatial_scales=scales)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-6)


@tpu_only
def test_extreme_aspect_rois_stay_finite(rng):
    """Beyond the window envelope the outermost samples clamp — values must
    stay finite and bounded (documented approximation tail)."""
    from cald_tpu.ops.pallas_roi_align import pallas_multi_scale_roi_align

    feats, scales = _pyramid(rng)
    rois = _rois(rng, 64, ar_max=8.0)
    out = np.asarray(pallas_multi_scale_roi_align(feats, rois, spatial_scales=scales))
    assert np.isfinite(out).all()
    assert np.abs(out).max() < 10.0


@tpu_only
def test_grad_parity_within_envelope(rng):
    """custom_vjp scatter-windows backward vs XLA autodiff of the points path:
    identical feature gradients for rois inside the window envelope."""
    from cald_tpu.ops.pallas_roi_align import pallas_multi_scale_roi_align
    from cald_tpu.ops.roi_align import multi_scale_roi_align

    feats, scales = _pyramid(rng)
    rois = _rois(rng, 96)
    cot = jnp.asarray(rng.normal(0, 1, (96, 7, 7, 128)).astype(np.float32))

    def loss_pallas(fs):
        out = pallas_multi_scale_roi_align(fs, rois, spatial_scales=scales)
        return jnp.sum(out * cot)

    def loss_points(fs):
        out = multi_scale_roi_align(list(fs), rois, spatial_scales=scales,
                                    method="points")
        return jnp.sum(out * cot)

    g_pallas = jax.jit(jax.grad(loss_pallas))(tuple(feats))
    g_points = jax.jit(jax.grad(loss_points))(tuple(feats))
    for gp, gx in zip(g_pallas, g_points):
        np.testing.assert_allclose(np.asarray(gp), np.asarray(gx),
                                   atol=2e-3, rtol=1e-3)


@tpu_only
def test_grad_vmapped_and_roi_cotangent_zero(rng):
    """The training call shape: vmap over images, grads flow to the features;
    rois receive exactly zero cotangents (they are stop_gradient'ed in the
    model anyway, faster_rcnn.py:195)."""
    from cald_tpu.ops.pallas_roi_align import pallas_multi_scale_roi_align
    from cald_tpu.ops.roi_align import multi_scale_roi_align

    feats, scales = _pyramid(rng, b=2)
    rois = _rois(rng, 32, b=2)

    def loss(fs, r, align):
        out = jax.vmap(lambda f0, f1, f2, f3, rr: align(
            [f0, f1, f2, f3], rr))(*fs, r)
        return jnp.sum(out ** 2)

    pal = lambda fs, rr: pallas_multi_scale_roi_align(fs, rr, spatial_scales=scales)
    pts = lambda fs, rr: multi_scale_roi_align(fs, rr, spatial_scales=scales,
                                               method="points")
    gf_pal, gr_pal = jax.jit(jax.grad(lambda fs, r: loss(fs, r, pal),
                                      argnums=(0, 1)))(tuple(feats), rois)
    gf_pts, _ = jax.jit(jax.grad(lambda fs, r: loss(fs, r, pts),
                                 argnums=(0, 1)))(tuple(feats), rois)
    assert float(jnp.abs(gr_pal).max()) == 0.0
    for gp, gx in zip(gf_pal, gf_pts):
        np.testing.assert_allclose(np.asarray(gp), np.asarray(gx),
                                   atol=2e-3, rtol=1e-3)


@tpu_only
def test_grad_bf16_dtype_preserved(rng):
    from cald_tpu.ops.pallas_roi_align import pallas_multi_scale_roi_align

    feats, scales = _pyramid(rng)
    feats = [f.astype(jnp.bfloat16) for f in feats]
    rois = _rois(rng, 16)
    g = jax.jit(jax.grad(lambda fs: jnp.sum(pallas_multi_scale_roi_align(
        fs, rois, spatial_scales=scales))))(tuple(feats))
    assert all(x.dtype == jnp.bfloat16 for x in g)
    assert all(np.isfinite(np.asarray(x, np.float32)).all() for x in g)
