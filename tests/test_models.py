"""Model layer tests (tiny configs, CPU).

Matcher/sampler semantics are checked against independent NumPy references;
full models are checked for shape contracts, finiteness, masking invariants,
and that a few SGD steps reduce the loss on a fixed batch.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cald_tpu.models import (
    Detections, FasterRCNN, FasterRCNNConfig, LossNet, RetinaNet, RetinaNetConfig,
)
from cald_tpu.models.anchors import cell_anchors, generate_anchors, grid_anchors_for_level
from cald_tpu.models.matcher import BELOW, BETWEEN, balanced_sample, match_anchors
from cald_tpu.models.fpn import FPN
from cald_tpu.models.lossnet import loss_pred_loss

B, H, W = 2, 64, 64
KGT = 5


def tiny_frcnn():
    return FasterRCNN(FasterRCNNConfig(
        num_classes=5, backbone="tiny", norm="group",
        rpn_pre_nms_top_n_train=64, rpn_pre_nms_top_n_test=64,
        rpn_post_nms_top_n_train=32, rpn_post_nms_top_n_test=32,
        rpn_batch_size_per_image=16, box_batch_size_per_image=16,
        detections_per_img=8, representation_size=32))


def tiny_retina():
    return RetinaNet(RetinaNetConfig(
        num_classes=5, backbone="tiny", norm="group",
        anchor_sizes=((16, 20),) * 5, detections_per_img=8, topk_candidates=32))


def fake_batch(rng):
    images = jnp.asarray(rng.uniform(0, 255, (B, H, W, 3)), jnp.float32)
    valid_hw = jnp.asarray([[H, W], [H - 8, W - 16]], jnp.int32)
    boxes = jnp.asarray(rng.uniform(5, 40, (B, KGT, 2)))
    wh = jnp.asarray(rng.uniform(5, 15, (B, KGT, 2)))
    gt_boxes = jnp.concatenate([boxes, boxes + wh], axis=-1).astype(jnp.float32)
    gt_labels = jnp.asarray(rng.integers(1, 5, (B, KGT)), jnp.int32)
    gt_valid = jnp.asarray([[1, 1, 1, 0, 0], [1, 1, 1, 1, 0]], bool)
    return images, valid_hw, gt_boxes, gt_labels, gt_valid


class TestAnchors:
    def test_cell_anchor_values(self):
        a = cell_anchors([32], [1.0])
        np.testing.assert_allclose(a, [[-16, -16, 16, 16]])
        a2 = cell_anchors([32], [0.5])  # h = 32*sqrt(.5)≈22.6->23, w = 32/sqrt(.5)≈45.3->45
        assert a2.shape == (1, 4)
        w = a2[0, 2] - a2[0, 0]
        h = a2[0, 3] - a2[0, 1]
        assert w > h

    def test_grid_anchor_layout(self):
        a = grid_anchors_for_level(2, 3, 8, [16], [1.0])
        assert a.shape == (6, 4)
        # first anchor centered at (0, 0), second shifted by stride in x
        np.testing.assert_allclose(a[0], [-8, -8, 8, 8])
        np.testing.assert_allclose(a[1], [0, -8, 16, 8])

    def test_generate_counts(self):
        anchors, counts = generate_anchors([(4, 4), (2, 2)], [8, 16],
                                           [(16,), (32,)], (0.5, 1.0, 2.0))
        assert counts == [48, 12]
        assert anchors.shape == (60, 4)


class TestMatcher:
    def _np_match(self, iou, high, low):
        best = iou.argmax(0)
        val = iou.max(0)
        out = np.where(val >= high, best, np.where(val < low, BELOW, BETWEEN))
        return out

    def test_matches_numpy_reference(self, rng):
        gt = np.array([[0, 0, 10, 10], [20, 20, 40, 40]], np.float32)
        anchors = np.array([[0, 0, 10, 10], [0, 0, 6, 10], [21, 21, 39, 39],
                            [100, 100, 110, 110], [18, 18, 42, 42]], np.float32)
        m = match_anchors(jnp.asarray(gt), jnp.ones(2, bool), jnp.asarray(anchors),
                          high=0.7, low=0.3, allow_low_quality=False)
        from cald_tpu.ops.boxes import box_iou
        iou = np.asarray(box_iou(jnp.asarray(gt), jnp.asarray(anchors)))
        np.testing.assert_array_equal(np.asarray(m), self._np_match(iou, 0.7, 0.3))

    def test_low_quality_recovers_best_anchor(self):
        gt = jnp.asarray([[0.0, 0.0, 10.0, 10.0]])
        anchors = jnp.asarray([[0.0, 0.0, 4.0, 4.0], [50.0, 50.0, 60.0, 60.0]])
        m_no = match_anchors(gt, jnp.ones(1, bool), anchors, high=0.7, low=0.3,
                             allow_low_quality=False)
        m_yes = match_anchors(gt, jnp.ones(1, bool), anchors, high=0.7, low=0.3,
                              allow_low_quality=True)
        assert int(m_no[0]) == BELOW  # iou 0.16 < 0.3
        assert int(m_yes[0]) == 0     # best anchor for the gt is rescued
        assert int(m_yes[1]) == BELOW

    def test_invalid_gt_never_matches(self):
        gt = jnp.asarray([[0.0, 0.0, 10.0, 10.0]])
        anchors = jnp.asarray([[0.0, 0.0, 10.0, 10.0]])
        m = match_anchors(gt, jnp.zeros(1, bool), anchors, high=0.5, low=0.4,
                          allow_low_quality=True)
        assert int(m[0]) == BELOW

    def test_balanced_sample_counts(self):
        matches = jnp.asarray([0, 1, 2] + [BELOW] * 20 + [BETWEEN] * 5)
        idx, is_pos, valid = balanced_sample(matches, jax.random.key(0),
                                             num_samples=8, positive_fraction=0.5)
        m = np.asarray(matches)[np.asarray(idx)]
        assert int(is_pos.sum()) == 3          # only 3 positives available
        assert int(valid.sum()) == 8
        assert (m[np.asarray(is_pos)] >= 0).all()
        assert (m[np.asarray(valid & ~is_pos)] == BELOW).all()  # never BETWEEN

    def test_balanced_sample_no_duplicate_positives(self):
        matches = jnp.asarray([0] * 10 + [BELOW] * 10)
        idx, is_pos, valid = balanced_sample(matches, jax.random.key(1),
                                             num_samples=10, positive_fraction=0.5)
        pos_idx = np.asarray(idx)[np.asarray(is_pos)]
        assert len(set(pos_idx.tolist())) == len(pos_idx)


class TestFPN:
    def test_pyramid_shapes(self, rng):
        fpn = FPN(out_channels=32, extra="pool")
        feats = [jnp.zeros((1, 16, 16, 8)), jnp.zeros((1, 8, 8, 16)),
                 jnp.zeros((1, 4, 4, 32))]
        vars_ = fpn.init(jax.random.key(0), feats)
        out = fpn.apply(vars_, feats)
        assert [o.shape for o in out] == [(1, 16, 16, 32), (1, 8, 8, 32),
                                          (1, 4, 4, 32), (1, 2, 2, 32)]

    def test_p6p7(self):
        fpn = FPN(out_channels=32, extra="p6p7")
        feats = [jnp.zeros((1, 8, 8, 16)), jnp.zeros((1, 4, 4, 32))]
        vars_ = fpn.init(jax.random.key(0), feats)
        out = fpn.apply(vars_, feats)
        assert [o.shape for o in out] == [(1, 8, 8, 32), (1, 4, 4, 32),
                                          (1, 2, 2, 32), (1, 1, 1, 32)]


@pytest.fixture(scope="module")
def frcnn_setup():
    rng = np.random.default_rng(0)
    model = tiny_frcnn()
    batch = fake_batch(rng)
    variables = jax.jit(model.init)(jax.random.key(0), batch[0], batch[1])
    return model, variables, batch


class TestFasterRCNN:
    def test_detect_contract(self, frcnn_setup):
        model, variables, batch = frcnn_setup
        images, valid_hw = batch[0], batch[1]
        dets = jax.jit(lambda v, im, hw: model.apply(v, im, hw, method="detect"))(
            variables, images, valid_hw)
        assert isinstance(dets, Detections)
        assert dets.boxes.shape == (B, 8, 4)
        assert dets.scores_cls.shape == (B, 8, 5)
        v = np.asarray(dets.valid)
        # invalid slots are fully zeroed
        assert (np.asarray(dets.scores)[~v] == 0).all()
        # valid boxes lie inside the per-image valid region
        bx = np.asarray(dets.boxes)
        hw = np.asarray(valid_hw)
        for i in range(B):
            if v[i].any():
                assert (bx[i][v[i]][:, [0, 2]] <= hw[i, 1] + 1e-3).all()
                assert (bx[i][v[i]][:, [1, 3]] <= hw[i, 0] + 1e-3).all()
        # consistency: prob_max == scores_cls.max(-1) on valid slots
        pm = np.asarray(dets.prob_max)
        rows = np.asarray(dets.scores_cls)
        np.testing.assert_allclose(pm[v], rows.max(-1)[v], rtol=1e-6)

    def test_loss_finite_and_trainable(self, frcnn_setup):
        model, variables, batch = frcnn_setup
        images, valid_hw, gb, gl, gv = batch

        def loss_fn(params, key):
            losses, _ = model.apply(
                {**variables, "params": params}, images, valid_hw, gb, gl, gv,
                method="loss", rngs={"sampling": key})
            return sum(jnp.asarray(v) for v in losses.values()), losses

        grad_fn = jax.jit(jax.value_and_grad(loss_fn, has_aux=True))
        params = variables["params"]
        (l0, losses), grads = grad_fn(params, jax.random.key(1))
        assert np.isfinite(float(l0))
        assert set(losses) == {"loss_objectness", "loss_rpn_box_reg",
                               "loss_classifier", "loss_box_reg"}
        gnorm = jax.tree.reduce(lambda a, g: a + float(jnp.abs(g).sum()), grads, 0.0)
        assert np.isfinite(gnorm) and gnorm > 0

        # a few SGD steps reduce the loss on the same batch
        lr = 1e-3
        l_prev = float(l0)
        for step in range(3):
            params = jax.tree.map(lambda p, g: p - lr * g, params, grads)
            (l_new, _), grads = grad_fn(params, jax.random.key(1))
        assert float(l_new) < l_prev

    def test_per_image_losses(self, frcnn_setup):
        model, variables, batch = frcnn_setup
        images, valid_hw, gb, gl, gv = batch
        losses, pyramid = jax.jit(
            lambda v: model.apply(v, images, valid_hw, gb, gl, gv, method="loss",
                                  per_image=True, rngs={"sampling": jax.random.key(2)})
        )(variables)
        for v in losses.values():
            assert v.shape == (B,)
        assert len(pyramid) == 5


@pytest.fixture(scope="module")
def retina_setup():
    rng = np.random.default_rng(1)
    model = tiny_retina()
    batch = fake_batch(rng)
    variables = jax.jit(model.init)(jax.random.key(0), batch[0], batch[1])
    return model, variables, batch


class TestRetinaNet:
    def test_detect_contract(self, retina_setup):
        model, variables, batch = retina_setup
        dets = jax.jit(lambda v, im, hw: model.apply(v, im, hw, method="detect"))(
            variables, batch[0], batch[1])
        assert dets.boxes.shape == (B, 8, 4)
        assert dets.scores_cls.shape == (B, 8, 5)
        v = np.asarray(dets.valid)
        lb = np.asarray(dets.labels)
        assert (lb[v] >= 1).all()  # background channel never emitted

    def test_focal_prior_initial_scores(self, retina_setup):
        """With the -log((1-pi)/pi) bias, initial sigmoid scores ~ pi = 0.01,
        so an untrained model emits (almost) no detections above 0.05."""
        model, variables, batch = retina_setup
        dets = model.apply(variables, batch[0], batch[1], method="detect")
        assert int(np.asarray(dets.valid).sum()) == 0

    def test_loss_finite_and_decreases(self, retina_setup):
        model, variables, batch = retina_setup
        images, valid_hw, gb, gl, gv = batch

        def loss_fn(params):
            losses, _ = model.apply({**variables, "params": params},
                                    images, valid_hw, gb, gl, gv, method="loss")
            return losses["classification"] + losses["bbox_regression"], losses

        grad_fn = jax.jit(jax.value_and_grad(loss_fn, has_aux=True))
        params = variables["params"]
        (l0, losses), grads = grad_fn(params)
        assert set(losses) == {"classification", "bbox_regression"}
        assert np.isfinite(float(l0))
        for _ in range(3):
            params = jax.tree.map(lambda p, g: p - 1e-3 * g, params, grads)
            (l_new, _), grads = grad_fn(params)
        assert float(l_new) < float(l0)


class TestLossNet:
    def test_shapes_and_loss(self):
        ln = LossNet(num_levels=2, interm_dim=8)
        feats = [jnp.ones((4, 8, 8, 16)), jnp.ones((4, 4, 4, 16))]
        vars_ = ln.init(jax.random.key(0), feats)
        pred = ln.apply(vars_, feats)
        assert pred.shape == (4,)
        target = jnp.asarray([1.0, 2.0, 3.0, 4.0])
        lp = loss_pred_loss(pred, target, margin=1.0)
        assert np.isfinite(float(lp))

    def test_loss_pred_loss_reference_values(self):
        # perfect ranking with big margins -> zero loss
        pred = jnp.asarray([10.0, 8.0, 0.0, -10.0])
        target = jnp.asarray([5.0, 4.0, 1.0, 0.0])
        # pairs: (10, -(-10)) ... compute explicitly against the formula
        half = 2
        pdiff = np.array([10.0 - (-10.0), 8.0 - 0.0])
        tdiff = np.array([5.0 - 0.0, 4.0 - 1.0])
        sign = np.where(tdiff > 0, 1, -1)
        expect = np.clip(1.0 - sign * pdiff, 0, None).sum() / half
        np.testing.assert_allclose(float(loss_pred_loss(pred, target)), expect, rtol=1e-6)


class TestSSMPostprocess:
    """ssm_postprocess_detections vs a per-class numpy transcription of
    frcnn_ssm.py:44-88 (no pre-NMS filter, per-class NMS + per-class top-k,
    post-NMS score filter)."""

    def _np_reference(self, scores, boxes, score_thresh, nms_thresh, top_per_class):
        from tests.test_ops_nms import np_nms

        n, c = scores.shape
        out = []
        for cls in range(1, c):
            keep = np_nms(boxes, scores[:, cls], nms_thresh)[:top_per_class]
            for i in keep:
                if scores[i, cls] > score_thresh:
                    out.append((float(scores[i, cls]), cls, i))
        return sorted(out, reverse=True)

    def test_matches_per_class_reference(self, rng):
        from cald_tpu.models.roi_heads import ssm_postprocess_detections

        n, c = 24, 4
        logits = rng.normal(0, 2.0, (n, c)).astype(np.float32)
        props = np.concatenate([rng.uniform(0, 40, (n, 2)),
                                rng.uniform(42, 60, (n, 2))], 1)[:, [0, 1, 2, 3]]
        props = props.astype(np.float32)
        props = np.stack([props[:, 0], props[:, 1],
                          props[:, 0] + rng.uniform(5, 20, n),
                          props[:, 1] + rng.uniform(5, 20, n)], 1).astype(np.float32)
        regs = np.zeros((n, c * 4), np.float32)  # decoded boxes == proposals
        hw = np.asarray([64, 64], np.int32)

        dets = jax.jit(lambda *a: ssm_postprocess_detections(
            *a, score_thresh=0.05, nms_thresh=0.3, detections_per_class=3,
            out_slots=32))(
            jnp.asarray(logits), jnp.asarray(regs), jnp.asarray(props),
            jnp.ones((n,), bool), jnp.asarray(hw))

        scores_np = np.asarray(jax.nn.softmax(jnp.asarray(logits), -1))
        boxes_clip = np.clip(props, 0, [64, 64, 64, 64]).astype(np.float32)
        want = self._np_reference(scores_np, boxes_clip, 0.05, 0.3, 3)

        v = np.asarray(dets.valid)
        got = sorted(
            [(float(s), int(l)) for s, l in
             zip(np.asarray(dets.scores)[v], np.asarray(dets.labels)[v])],
            reverse=True)
        assert got == [(pytest.approx(s, rel=1e-5), cls) for s, cls, _ in want]
        # full softmax rows ride along for judge_y/judge_uv
        rows = np.asarray(dets.scores_cls)[v]
        assert rows.shape[1] == c
        np.testing.assert_allclose(rows.sum(-1), 1.0, atol=1e-5)

    def test_per_class_cap_and_no_prefilter(self):
        """A class with many disjoint boxes is capped at detections_per_class;
        sub-threshold boxes survive NMS but are filtered after (so they still
        suppress neighbors, unlike the standard path)."""
        from cald_tpu.models.roi_heads import ssm_postprocess_detections

        n, c = 8, 2
        # 8 disjoint boxes, scores descending; a 9th-style duplicate of box 0
        props = np.asarray([[i * 8.0, 0.0, i * 8.0 + 6.0, 6.0] for i in range(n)],
                           np.float32)
        logits = np.zeros((n, c), np.float32)
        fg = np.linspace(3.0, 1.0, n).astype(np.float32)
        logits[:, 1] = fg
        regs = np.zeros((n, c * 4), np.float32)
        dets = ssm_postprocess_detections(
            jnp.asarray(logits), jnp.asarray(regs), jnp.asarray(props),
            jnp.ones((n,), bool), jnp.asarray([64, 64], np.int32),
            score_thresh=0.05, nms_thresh=0.3, detections_per_class=4,
            out_slots=16)
        assert int(np.asarray(dets.valid).sum()) == 4  # capped per class
