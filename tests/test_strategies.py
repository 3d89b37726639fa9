"""Strategy tests.

cls_kldiv_rank is golden-tested against a literal torch re-implementation of the
reference loop (cald_train.py:234-271); subsample_reference against the numpy
linspace rule; the full CALD scorer runs end-to-end on the tiny detector.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cald_tpu.strategies import (
    CALDConfig, cald_select, cls_kldiv_rank, make_cald_score_fn, random_select,
    subsample_reference,
)
from cald_tpu.strategies.ltc import ltc_scores, _legacy_iou
from cald_tpu.strategies.ll4al import ll_select
from cald_tpu.strategies.ssm import judge_uv, judge_y, pseudo_loss, ssm_select
from cald_tpu.models.detections import Detections


class TestSubsample:
    def _np_rule(self, n, k_ref=50, threshold=40):
        if n > threshold:
            return np.round(np.linspace(0, n - 1, k_ref)).astype(int)
        return np.arange(min(n, k_ref))

    @pytest.mark.parametrize("n", [0, 5, 40, 41, 70, 100])
    def test_matches_reference_linspace(self, n, rng):
        k = 100
        boxes = jnp.asarray(rng.uniform(0, 50, (k, 4)), jnp.float32)
        scores = jnp.asarray(-np.arange(k, dtype=np.float32))
        labels = jnp.asarray(rng.integers(1, 5, (k,)), jnp.int32)
        rows = jnp.asarray(rng.uniform(size=(k, 5)), jnp.float32)
        pm = rows.max(-1)
        valid = jnp.arange(k) < n
        sb, ss, sl, sr, sp, sv = subsample_reference(
            boxes, scores, labels, rows, pm, valid, k_ref=50, threshold=40)
        expect = self._np_rule(n)
        got = np.asarray(sb)[np.asarray(sv)]
        np.testing.assert_allclose(got, np.asarray(boxes)[expect], rtol=1e-6)
        assert int(sv.sum()) == len(expect)


def _reference_cls_kldiv(cls_corrs, result_mean, budget, uniform=False):
    """Literal port of cald_train.py:234-271 (torch), greedy loop included."""
    import torch
    import torch.nn as nn

    cls_inds = []
    for a in list(np.where(np.sum(cls_corrs, axis=1) == 0)[0]):
        cls_inds.append(int(a))
    while len(cls_inds) < budget:
        KLDivLoss = nn.KLDivLoss(reduction="none")
        _cls_corrs = torch.tensor(np.asarray(cls_corrs))
        _result = torch.tensor(result_mean).unsqueeze(0)
        if uniform:
            p = torch.nn.functional.softmax(_result + _cls_corrs, -1)
            q = torch.nn.functional.softmax(torch.ones(_result.shape) / len(_result), -1)
            log_mean = ((p + q) / 2).log()
            jsdiv = torch.sum(KLDivLoss(log_mean, p), dim=1) / 2 \
                + torch.sum(KLDivLoss(log_mean, q), dim=1) / 2
            jsdiv[cls_inds] = 100
            cls_inds.append(int(torch.argmin(jsdiv).item()))
        else:
            p = torch.nn.functional.softmax(_result, -1)
            q = torch.nn.functional.softmax(_cls_corrs, -1)
            log_mean = ((p + q) / 2).log()
            jsdiv = torch.sum(KLDivLoss(log_mean, p), dim=1) / 2 \
                + torch.sum(KLDivLoss(log_mean, q), dim=1) / 2
            jsdiv[cls_inds] = -1
            cls_inds.append(int(torch.argmax(jsdiv).item()))
    return cls_inds


class TestClsKldiv:
    @pytest.mark.parametrize("uniform", [False, True])
    def test_matches_reference_loop(self, uniform, rng):
        torch = pytest.importorskip("torch")
        n_cand, c = 24, 6
        cls_corrs = rng.uniform(0, 1, (n_cand, c))
        cls_corrs[3] = 0.0  # a zero-detection candidate
        cls_corrs[17] = 0.0
        labeled_mean = rng.uniform(0, 3, (c,))
        budget = 10
        ref = _reference_cls_kldiv(cls_corrs.copy(), labeled_mean.copy(), budget,
                                   uniform)
        got = cls_kldiv_rank(cls_corrs, labeled_mean, budget, uniform=uniform)
        assert set(got.tolist()) == set(ref)
        # zero-det candidates first in both
        assert set(got[:2].tolist()) == {3, 17}

    def test_zero_det_overflow_kept(self, rng):
        cls_corrs = np.zeros((5, 4))  # all zero-detection
        got = cls_kldiv_rank(cls_corrs, np.ones(4), budget=3)
        assert len(got) == 5  # reference appends ALL zero-det candidates


class TestCALDSelect:
    def test_no_mutual_takes_lowest(self, rng):
        cons = rng.uniform(size=20)
        cfg = CALDConfig(no_mutual=True)
        got = cald_select(cons, np.zeros((20, 3)), np.ones(3), 5, cfg)
        np.testing.assert_array_equal(got, np.argsort(cons, kind="stable")[:5])

    def test_mutual_selects_within_candidates(self, rng):
        cons = rng.uniform(size=30)
        corrs = rng.uniform(size=(30, 4))
        cfg = CALDConfig(mutual_range=1.2)
        got = cald_select(cons, corrs, np.ones(4), 10, cfg)
        cand = set(np.argsort(cons, kind="stable")[:12].tolist())
        assert set(got.tolist()) <= cand
        assert len(got) == 10
        assert len(set(got.tolist())) == 10


class TestCALDScoreFn:
    def test_end_to_end_tiny_model(self, rng):
        from tests.test_models import tiny_frcnn, fake_batch
        model = tiny_frcnn()
        images, valid_hw, *_ = fake_batch(rng)
        variables = jax.jit(model.init)(jax.random.key(0), images, valid_hw)
        cfg = CALDConfig(k_ref=8)
        fn = make_cald_score_fn(model, cfg, num_classes=5)
        cons, corrs = fn(variables, images, valid_hw, jax.random.key(1))
        assert cons.shape == (2,)
        assert corrs.shape == (2, 4)
        assert bool(jnp.isfinite(cons).all())
        assert float(cons.min()) >= 0.0 and float(cons.max()) <= 1.0
        assert bool((corrs >= 0).all()) and bool((corrs <= 1).all())


class TestLTC:
    def test_legacy_iou_value(self):
        # the reference's calcu_iou mixes +1 conventions (SURVEY.md §2.6):
        # a box against itself gives 100 / (90 + 90 - 100) = 1.25, not 1.0.
        a = jnp.asarray([0.0, 0.0, 9.0, 9.0])
        assert float(_legacy_iou(a, a)) == pytest.approx(1.25)
        b = jnp.asarray([100.0, 100.0, 110.0, 110.0])
        assert float(_legacy_iou(a, b)) == 0.0

    def test_scores_hand_computed(self):
        k, c = 3, 4
        boxes = jnp.asarray([[[0, 0, 9, 9], [0, 0, 9, 9], [0, 0, 0, 0]]], jnp.float32)
        props = jnp.asarray([[[0, 0, 9, 9], [5, 5, 14, 14], [0, 0, 0, 0]]], jnp.float32)
        pm = jnp.asarray([[0.9, 0.6, 0.0]])
        dets = Detections(
            boxes=boxes, scores=pm, labels=jnp.ones((1, k), jnp.int32),
            valid=jnp.asarray([[True, True, False]]),
            scores_cls=jnp.zeros((1, k, c)), prob_max=pm, props=props)
        s = ltc_scores(dets)
        # det0: |legacy_iou(self)=1.25 + 0.9 - 1| = 1.15; det1 wins the min
        iou1 = float(_legacy_iou(boxes[0, 1], props[0, 1]))
        expect = min(1.15, abs(iou1 + 0.6 - 1.0))
        assert float(s[0]) == pytest.approx(expect, rel=1e-5)


class TestLL4AL:
    def test_select_descending(self):
        scores = np.array([0.1, 5.0, 3.0, 4.0])
        np.testing.assert_array_equal(ll_select(scores, 2), [1, 3])


class TestSSMLogic:
    def test_judge_y_and_loss(self):
        rows = np.array([0.9, 0.2, 0.6])
        y = judge_y(rows)
        np.testing.assert_array_equal(y, [1, -1, 1])
        loss = pseudo_loss(rows, y)
        np.testing.assert_allclose(
            loss, [-np.log(0.9), -np.log(0.8 + 1e-30), -np.log(0.6)], rtol=1e-6)

    def test_judge_uv(self):
        clslambda = np.full(3, np.log(2))
        easy, v = judge_uv(np.array([0.01, 0.01, 0.01]), gamma=0.15,
                           clslambda=clslambda)
        assert easy and (v > 0.9).all()
        hard, v2 = judge_uv(np.array([1.0, 1.0, 1.0]), gamma=0.15,
                            clslambda=clslambda)
        assert not hard and (v2 == 0).all()

    def test_ssm_select_stage1_and_backfill(self):
        c = 3
        dets = [
            {"al": True, "boxes": np.zeros((0, 4)), "score_rows": np.zeros((0, c))},
            {"al": False, "boxes": np.array([[0, 0, 5, 5.0]]),
             "score_rows": np.array([[0.99, 0.99, 0.99]])},  # huge loss -> hard
            {"al": False, "boxes": np.zeros((0, 4)), "score_rows": np.zeros((0, c))},
        ]
        chosen, gamma, lam = ssm_select(
            dets, np.arange(3), budget=2, gamma=0.15,
            clslambda=np.full(c, np.log(2)), cross_validator=None,
            labeled_indices=[], rng=np.random.default_rng(0), patch_getter=None)
        assert 0 in chosen           # al flag first
        assert 1 in chosen           # hard sample
        assert gamma == pytest.approx(0.2)
        assert lam.shape == (c,)


class TestRandom:
    def test_random_select(self):
        got = random_select(100, 10, np.random.default_rng(0))
        assert len(got) == 10 and len(set(got.tolist())) == 10


class TestLSC:
    """LS/C end-to-end on the tiny detector — guards the 0..255 noise scale
    (round-1 bug: std/255 noise on raw pixels made the perturbation invisible,
    so every image scored its noise-free stability)."""

    def test_noise_actually_moves_the_score(self, rng):
        from tests.test_models import tiny_frcnn, fake_batch
        from cald_tpu.strategies.lsc import make_lsc_score_fn

        model = tiny_frcnn()
        images, valid_hw, *_ = fake_batch(rng)
        variables = jax.jit(model.init)(jax.random.key(0), images, valid_hw)

        real = make_lsc_score_fn(model, stds=(8.0, 24.0, 48.0))
        nonoise = make_lsc_score_fn(model, stds=(1e-6, 1e-6, 1e-6))
        s_real = np.asarray(real(variables, images, valid_hw, jax.random.key(1)))
        s_zero = np.asarray(nonoise(variables, images, valid_hw, jax.random.key(1)))

        assert s_real.shape == (2,)
        assert np.isfinite(s_real).all() and np.isfinite(s_zero).all()
        # with ~zero noise each ref box re-matches itself (stability ~1);
        # real noise must perturb the detections and move the score.
        assert not np.allclose(s_real, s_zero, atol=1e-4), (s_real, s_zero)

    def test_scores_hand_computed_formula(self):
        # one image, 2 ref boxes, 2 noise levels, synthetic IoUs via direct
        # formula check: score = sum(pm*stab)/sum(pm) - max(1-pm)
        pm = np.array([0.9, 0.6])
        stab = np.array([0.8, 0.5])
        want = (pm * stab).sum() / pm.sum() - (1 - pm).max()
        assert want == pytest.approx(1.02 / 1.5 - 0.4)


class TestVAAL:
    """VAAL trainer/selection (vaal_train.py:99-148, vaal_helper.py:171-216)."""

    def test_trainer_losses_finite_and_improving(self, rng):
        from cald_tpu.strategies.vaal import VAALTrainer, vaal_select

        trainer = VAALTrainer(z_dim=8, base_width=8, image_size=32, lr=1e-3)
        lab = jnp.asarray(rng.uniform(0, 255, (2, 40, 40, 3)).astype(np.float32))
        unlab = jnp.asarray(rng.uniform(0, 255, (2, 40, 40, 3)).astype(np.float32))
        key = jax.random.key(0)
        first = trainer.train_step(lab, unlab, jax.random.fold_in(key, 0))
        assert np.isfinite(first).all()
        for i in range(1, 6):
            vloss, dloss = trainer.train_step(lab, unlab, jax.random.fold_in(key, i))
        assert np.isfinite([vloss, dloss]).all()
        assert vloss < first[0]  # VAE reconstruction improves on a fixed batch

        scores = trainer.unlabeled_scores(unlab, jax.random.fold_in(key, 99))
        assert scores.shape == (2,) and np.isfinite(scores).all()
        picked = vaal_select(np.array([0.1, 0.9, 0.5]), 2)
        assert picked.tolist() == [1, 2]

    def test_vae_loss_matches_reference_sum_kld(self):
        """KLD is the RAW sum, not normalized (vaal_helper.py:171-180)."""
        from cald_tpu.models.vae import vae_loss

        mu = jnp.asarray([[0.5, -0.5], [1.0, 0.0]])
        logvar = jnp.zeros((2, 2))
        x = jnp.zeros((2, 4, 4, 3))
        recon = jnp.ones((2, 4, 4, 3))
        want_kld = float(-0.5 * np.sum(1 + 0 - np.asarray(mu) ** 2 - 1))
        got = float(vae_loss(recon, x, mu, logvar, beta=1.0))
        assert got == pytest.approx(0.1 * 1.0 + want_kld, rel=1e-6)

    def test_driver_uses_reference_sgd_schedule(self):
        """_make_vaal_trainer wires SGD lr/10 (VAE) and lr (D)."""
        from cald_tpu.cli.config import ALConfig
        from cald_tpu.cli.driver import _make_vaal_trainer

        cfg = ALConfig(tiny=True).resolve()
        trainer = _make_vaal_trainer(cfg, steps_per_epoch=2, cycle=0)
        # one step on tiny shapes must run through both optax chains
        lab = jnp.zeros((1, 256, 256, 3))
        vloss, dloss = trainer.train_step(lab, lab, jax.random.key(0))
        assert np.isfinite([vloss, dloss]).all()
