"""Detector golden-parity harness (VERDICT round-1 item 3).

Asserts the Flax Faster R-CNN eval path — RPN head -> proposal filtering ->
MultiScaleRoIAlign -> box head -> postprocess with the CALD extras — reproduces
a literal numpy/torch transcription of the reference formulas
(tests/golden_reference.py; /root/reference/detection/frcnn_la.py:32-87,
frcnn_ll.py:283-322) within 1e-3, given identical weights and inputs.

The seam is the FPN pyramid: both paths consume the same Flax features, so the
comparison isolates detection logic (ordering, conventions, NMS/top-k
semantics, coder weights, the fg-only prob_max) from conv numerics.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from cald_tpu.models.faster_rcnn import FasterRCNN, FasterRCNNConfig  # noqa: E402
from tests.golden_reference import golden_detect  # noqa: E402

CANVAS = (96, 128)


def _make_cfg():
    return FasterRCNNConfig(
        num_classes=4, backbone="tiny", norm="group", compute_dtype="float32",
        rpn_pre_nms_top_n_test=200, rpn_post_nms_top_n_test=64,
        rpn_batch_size_per_image=32, box_batch_size_per_image=32,
        detections_per_img=20, representation_size=64)


def _amplify(params):
    """Random init gives near-zero heads (std 0.01) — flat softmax, identical
    boxes. Scale the head kernels so scores and deltas spread out and the
    filter/NMS/top-k logic actually has work to do."""
    import copy

    p = copy.deepcopy(jax.tree.map(np.asarray, params))
    # moderate: over-amplified heads saturate softmax rows (score == 1.0) or
    # blow boxes past the image so clipping collapses them — both create ties
    # whose NMS ordering is legitimately implementation-defined
    for name, f in (("objectness", 60.0), ("deltas", 8.0), ("conv", 3.0)):
        p["rpn_head"][name]["kernel"] = p["rpn_head"][name]["kernel"] * f
    p["box_predictor"]["cls_score"]["kernel"] = (
        p["box_predictor"]["cls_score"]["kernel"] * 35.0)
    p["box_predictor"]["bbox_pred"]["kernel"] = (
        p["box_predictor"]["bbox_pred"]["kernel"] * 15.0)
    return p


@pytest.fixture(scope="module")
def setup():
    cfg = _make_cfg()
    model = FasterRCNN(cfg)
    rng = np.random.default_rng(7)
    # smooth-ish content in the production 0..255 range, one padded image
    images = rng.uniform(0, 255, (2, *CANVAS, 3)).astype(np.float32)
    images[1, 80:, :, :] = 0.0
    images[1, :, 100:, :] = 0.0
    valid_hw = np.array([[96, 128], [80, 100]], np.int32)

    # strict f32 matmuls/convs: TPU's default precision rounds f32 operands to
    # bf16 passes, which diverges from the torch-f32 golden path by ~1e-2
    with jax.default_matmul_precision("float32"):
        variables = jax.jit(model.init)(jax.random.key(0), jnp.asarray(images),
                                        jnp.asarray(valid_hw))
        variables = {**variables, "params": _amplify(variables["params"])}
        pyramid = jax.jit(
            lambda v, im, hw: model.apply(v, im, hw, method="extract_features"))(
            variables, jnp.asarray(images), jnp.asarray(valid_hw))
    pyramid = [np.asarray(f, np.float32) for f in pyramid]
    return cfg, model, variables, images, valid_hw, pyramid


def _flax_detections(model, variables, images, valid_hw):
    with jax.default_matmul_precision("float32"):
        dets = jax.jit(
            lambda v, im, hw: model.apply(v, im, hw, method="detect"))(
            variables, jnp.asarray(images), jnp.asarray(valid_hw))
    return jax.tree.map(np.asarray, dets)


def _compare_image(dets, i, golden, atol=1e-3):
    v = dets.valid[i].astype(bool)
    n_flax, n_gold = int(v.sum()), len(golden["boxes"])
    assert n_flax == n_gold, (n_flax, n_gold)
    if n_gold == 0:
        return
    # order-insensitive: sort both by descending score. Guard against score
    # ties, which make the pairing ambiguous (fixture must avoid them).
    assert len(np.unique(np.round(golden["scores"], 5))) == n_gold, \
        "fixture has tied scores; lower the weight amplification"
    fo = np.argsort(-dets.scores[i][v], kind="stable")
    go = np.argsort(-golden["scores"], kind="stable")
    np.testing.assert_allclose(dets.scores[i][v][fo], golden["scores"][go],
                               atol=atol)
    np.testing.assert_allclose(dets.boxes[i][v][fo], golden["boxes"][go],
                               atol=1e-2)
    np.testing.assert_array_equal(dets.labels[i][v][fo], golden["labels"][go])
    np.testing.assert_allclose(dets.prob_max[i][v][fo], golden["prob_max"][go],
                               atol=atol)
    np.testing.assert_allclose(dets.scores_cls[i][v][fo],
                               golden["scores_cls"][go], atol=atol)
    np.testing.assert_allclose(dets.props[i][v][fo], golden["props"][go],
                               atol=1e-2)


def test_detect_matches_reference_transcription(setup, monkeypatch):
    monkeypatch.setenv("CALD_TPU_NO_PALLAS_ROI", "1")  # exact XLA points path
    cfg, model, variables, images, valid_hw, pyramid = setup
    dets = _flax_detections(model, variables, images, valid_hw)
    for i in range(2):
        golden = golden_detect([f[i:i + 1] for f in pyramid],
                               jax.tree.map(np.asarray, variables["params"]),
                               valid_hw[i], cfg)
        assert len(golden["boxes"]) > 3, "degenerate fixture: too few detections"
        _compare_image(dets, i, golden)


def test_detect_pallas_roi_path_matches(setup):
    """Same comparison through the Pallas window-DMA RoIAlign (TPU only)."""
    if jax.default_backend() not in ("tpu", "axon"):
        pytest.skip("Pallas RoIAlign path needs a TPU backend")
    cfg, model, variables, images, valid_hw, pyramid = setup
    dets = _flax_detections(model, variables, images, valid_hw)
    for i in range(2):
        golden = golden_detect([f[i:i + 1] for f in pyramid],
                               jax.tree.map(np.asarray, variables["params"]),
                               valid_hw[i], cfg)
        _compare_image(dets, i, golden)
