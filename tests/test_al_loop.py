"""End-to-end AL loop integration tests on synthetic VOC (tiny model, CPU).

This is the mini end-to-end slice from SURVEY.md §7 / BASELINE.json configs[0]:
one-to-two CALD cycles, CPU-runnable, exercising train -> eval -> score ->
select -> relabel through the real driver.
"""

import numpy as np
import pytest

from cald_tpu.cli.config import ALConfig, build_config_from_args
from cald_tpu.cli.driver import al_loop, build_datasets
from cald_tpu.data import get_voc2007
from tests.fixtures import make_voc


@pytest.fixture(scope="module")
def voc_root(tmp_path_factory):
    return make_voc(tmp_path_factory.mktemp("voc_al"), num_images=12,
                    size_range=((60, 90), (60, 90)))


def mini_cfg(voc_root, **kw) -> ALConfig:
    base = dict(
        dataset="voc2007", data_path=voc_root, model="faster", strategy="cald",
        tiny=True, norm="group", cycles=2, epochs=1, batch_size=2,
        init_num=4, budget_num=3, score_batch_size=2, workers=2,
        min_size=96, max_size=128, max_boxes=8, print_freq=100,
        aspect_ratio_group_factor=0, eval_every_cycle=True)
    base.update(kw)
    return ALConfig(**base).resolve()


class TestConfig:
    def test_reference_defaults(self):
        cfg = ALConfig(dataset="voc2012", model="faster").resolve()
        assert (cfg.init_num, cfg.budget_num) == (500, 500)
        assert (cfg.min_size, cfg.max_size) == (600, 1000)
        cfg = ALConfig(dataset="voc2012", model="retina").resolve()
        assert cfg.init_num == 1000
        cfg = ALConfig(dataset="coco").resolve()
        assert (cfg.init_num, cfg.budget_num, cfg.pool_cap) == (5000, 1000, 10000)
        assert (cfg.min_size, cfg.max_size) == (800, 1333)
        cfg = ALConfig(dataset="voc2007", strategy="random").resolve()
        assert (cfg.init_num, cfg.budget_num) == (1000, 1000)

    def test_scoring_model_variant(self):
        """Scoring counts resolve to reference-faithful for every model
        (round 5: with the flm RoI kernel the floor-gated 768 trim buys only
        +2.8%, PERF.md); opt-in trims apply to the pool-scoring model only,
        capped at the model's own counts (PERF.md round 2)."""
        from cald_tpu.cli.driver import _scoring_model, build_model

        # faster default = reference-faithful counts (scoring model IS the
        # model); the round-4 trim stays one flag away
        cfg = ALConfig(model="faster").resolve()
        assert (cfg.score_rpn_pre_nms, cfg.score_rpn_post_nms) == (0, 0)
        model, _ = build_model(cfg, 21)
        assert _scoring_model(cfg, model) is model
        trim = ALConfig(model="faster", score_rpn_post_nms=768).resolve()
        trim_scoring = _scoring_model(trim, model)
        assert trim_scoring.cfg.rpn_post_nms_top_n_test == 768
        assert trim_scoring.cfg.rpn_pre_nms_top_n_test == 1000
        assert trim_scoring.cfg.rpn_post_nms_top_n_train == 2000
        # retina default = reference-faithful (topk trim fidelity near-floor
        # but thin evidence, EXPERIMENTS.md)
        assert ALConfig(model="retina").resolve().score_rpn_post_nms == 0
        # explicit 0 = reference-faithful: scoring model is the model itself
        cfg = ALConfig(model="faster", score_rpn_post_nms=0).resolve()
        assert (cfg.score_rpn_pre_nms, cfg.score_rpn_post_nms) == (0, 0)
        assert _scoring_model(cfg, model) is model
        # opt-in trims the test-time counts; train untouched
        fcfg = ALConfig(model="faster", score_rpn_pre_nms=400,
                        score_rpn_post_nms=256).resolve()
        fast = _scoring_model(fcfg, model)
        assert fast.cfg.rpn_pre_nms_top_n_test == 400
        assert fast.cfg.rpn_post_nms_top_n_test == 256
        assert fast.cfg.rpn_post_nms_top_n_train == 2000  # train untouched
        # tiny config already below the caps -> unchanged object
        tiny_cfg = ALConfig(model="faster", tiny=True, score_rpn_pre_nms=400,
                            score_rpn_post_nms=256).resolve()
        tiny, _ = build_model(tiny_cfg, 21)
        assert _scoring_model(tiny_cfg, tiny) is tiny
        # retinanet analog: per-level topk_candidates trimmed to the post count
        rcfg = ALConfig(model="retina", score_rpn_pre_nms=400,
                        score_rpn_post_nms=256).resolve()
        rmodel, _ = build_model(rcfg, 21)
        rfast = _scoring_model(rcfg, rmodel)
        assert rfast.cfg.topk_candidates == 256
        assert rfast.cfg.detections_per_img == rmodel.cfg.detections_per_img
        roff = ALConfig(model="retina").resolve()
        assert _scoring_model(roff, rmodel) is rmodel

    def test_parser_reference_flags(self):
        cfg = build_config_from_args(
            ["--dataset", "voc2012", "--model", "retina", "--augs", "FC",
             "-bp", "1.25", "-mr", "1.5", "--no-mutual", "--cycles", "3"])
        assert cfg.bp == 1.25 and cfg.mr == 1.5 and cfg.no_mutual
        assert cfg.cycles == 3 and cfg.augs == "FC"


@pytest.mark.slow
class TestALLoop:
    def test_cald_two_cycles(self, voc_root, tmp_path):
        cfg = mini_cfg(voc_root, profile_dir=str(tmp_path / "trace"))
        ds = get_voc2007(voc_root, "trainval")
        history = al_loop(cfg, datasets=(ds, ds))
        assert len(history) == 2
        # budget images were added after cycle 0
        assert history[0]["labeled"] == 4 + 3
        assert "mAP" in history[0]["eval"]
        # --profile-dir captured a jax.profiler trace of cycle 0
        traces = list((tmp_path / "trace").rglob("*.xplane.pb"))
        assert traces, "no profiler trace written under --profile-dir"

    def test_random_strategy(self, voc_root):
        cfg = mini_cfg(voc_root, strategy="random", init_num=4, budget_num=3,
                       eval_every_cycle=False)
        ds = get_voc2007(voc_root, "trainval")
        history = al_loop(cfg, datasets=(ds, ds))
        assert history[0]["labeled"] == 7

    def test_ltc_strategy(self, voc_root):
        cfg = mini_cfg(voc_root, strategy="ltc", eval_every_cycle=False)
        ds = get_voc2007(voc_root, "trainval")
        history = al_loop(cfg, datasets=(ds, ds))
        assert history[0]["labeled"] == 7

    def test_coco_cald_cycle(self, tmp_path_factory):
        """BASELINE configs[3] shape: COCO data + CALD + coco eval."""
        from cald_tpu.data import get_coco
        from tests.fixtures import make_coco

        root = make_coco(tmp_path_factory.mktemp("coco_al"), num_images=10,
                         hw=(70, 90), num_classes=3)
        train = get_coco(root, "train")
        cfg = ALConfig(
            dataset="coco", data_path=root, model="faster", strategy="cald",
            tiny=True, norm="group", cycles=2, epochs=1, batch_size=2,
            init_num=4, budget_num=3, pool_cap=6, score_batch_size=2,
            workers=2, min_size=96, max_size=128, max_boxes=8, print_freq=100,
            aspect_ratio_group_factor=0).resolve()
        hist = al_loop(cfg, datasets=(train, train))
        assert hist[0]["labeled"] == 7
        assert "AP" in hist[0]["eval"]

    def test_vaal_strategy(self, voc_root):
        """Interleaved task+VAE+D schedule (vaal_train.py:99-148,248-251)."""
        cfg = mini_cfg(voc_root, strategy="vaal", eval_every_cycle=False)
        ds = get_voc2007(voc_root, "trainval")
        history = al_loop(cfg, datasets=(ds, ds))
        assert history[0]["labeled"] == 7

    def test_ll4al_strategy(self, voc_root):
        """Joint detector+LossNet training + LossNet-predicted-loss selection
        (ll_train.py:55-133,145-166)."""
        cfg = mini_cfg(voc_root, strategy="ll4al", eval_every_cycle=False,
                       task_epochs=1)
        ds = get_voc2007(voc_root, "trainval")
        history = al_loop(cfg, datasets=(ds, ds))
        assert history[0]["labeled"] == 7

    def test_ssm_strategy(self, voc_root):
        """SSM two-stage selection incl. cross-validation paste-and-redetect
        (ssm_train.py:197-268)."""
        cfg = mini_cfg(voc_root, strategy="ssm", eval_every_cycle=False)
        ds = get_voc2007(voc_root, "trainval")
        history = al_loop(cfg, datasets=(ds, ds))
        assert history[0]["labeled"] == 7

    def test_lsc_strategy(self, voc_root):
        """LS/C noise-stability scoring (ls_c_train.py:122-155)."""
        cfg = mini_cfg(voc_root, strategy="lsc", eval_every_cycle=False)
        ds = get_voc2007(voc_root, "trainval")
        history = al_loop(cfg, datasets=(ds, ds))
        assert history[0]["labeled"] == 7

    @pytest.mark.parametrize("strategy", ["cald", "ll4al", "vaal"])
    def test_resume_bit_identical_history(self, voc_root, tmp_path, strategy):
        """Kill after cycle k, resume from the cycle-k checkpoint: the resumed
        run's selections and subsequent training/eval match the uninterrupted
        run bit-for-bit (round-2 VERDICT item 4; capability the reference's
        --skip lacks). ll4al/vaal exercise the ``extra`` carry-state path
        (LossNet / VAE+D params ride the cycle checkpoint, round-3 VERDICT
        item 6) — the resumed cycle must NOT retrain and must still select
        identically."""
        kw: dict = dict(cycles=3, strategy=strategy,
                        eval_every_cycle=strategy == "cald")
        if strategy == "ll4al":
            kw["task_epochs"] = 1
        ds = get_voc2007(voc_root, "trainval")
        full = al_loop(mini_cfg(voc_root, output_dir=str(tmp_path / "full"),
                                **kw),
                       datasets=(ds, ds))
        # the "killed" run: identical config, stopped after cycle 1's
        # checkpoint (cycles=2 trains/evals/saves cycle 1, then stops
        # before its selection — exactly a mid-run kill)
        al_loop(mini_cfg(voc_root, output_dir=str(tmp_path / "killed"),
                         **{**kw, "cycles": 2}),
                datasets=(ds, ds))
        res = al_loop(mini_cfg(voc_root, output_dir=str(tmp_path / "res"),
                               resume=str(tmp_path / "killed" / "cycle_1"),
                               **kw),
                      datasets=(ds, ds))
        assert res[0] == {"cycle": 0, "resumed": True}
        # cycle 1: selection redone from the restored model+pool
        assert res[1]["labeled"] == full[1]["labeled"]
        assert res[1]["labeled_digest"] == full[1]["labeled_digest"]
        # the carry-state made the resumed cycle a pure restore (no retrain —
        # the driver marks a restored cycle's stats instead of re-evaluating)
        assert res[1]["eval"] == {"resumed": True}
        # cycle 2: trained fresh on the restored trajectory
        assert res[2]["labeled_digest"] == full[2]["labeled_digest"]
        if strategy == "cald":
            assert res[2]["eval"] == full[2]["eval"]

    def test_skip_first_cycle_checkpoint(self, voc_root, tmp_path):
        """--skip reuses the saved first-cycle model (cald_train.py:349-356)."""
        import os

        ds = get_voc2007(voc_root, "trainval")
        cfg = mini_cfg(voc_root, strategy="random", cycles=1,
                       eval_every_cycle=False,
                       first_checkpoint_path=str(tmp_path))
        al_loop(cfg, datasets=(ds, ds))
        assert os.path.isdir(tmp_path / "voc2007_faster_1st")
        cfg2 = mini_cfg(voc_root, strategy="random", cycles=1,
                        eval_every_cycle=False, skip=True,
                        first_checkpoint_path=str(tmp_path))
        hist = al_loop(cfg2, datasets=(ds, ds))
        assert len(hist) == 1


@pytest.mark.slow
def test_driver_applies_pretrained_backbone(tmp_path, rng):
    """--pretrained-backbone flows through _fresh_state into the cycle's model
    (the analog of pretrained_backbone=True, frcnn_la.py:283)."""
    torch = pytest.importorskip("torch")

    from cald_tpu.cli.driver import _fresh_state, build_model
    from cald_tpu.data import ALPoolState, create_aspect_ratio_groups, default_canvases, get_voc2007
    from cald_tpu.convert.torchvision_import import torch_conv_to_flax
    from tests.fixtures import make_voc
    from tests.test_convert import _fake_torchvision_sd

    root = make_voc(tmp_path / "voc", num_images=4)
    ds = get_voc2007(root, "trainval")
    path = str(tmp_path / "resnet50.pth")
    sd = _fake_torchvision_sd(rng)
    torch.save(sd, path)

    cfg = mini_cfg(root, model="faster", tiny=False, norm="frozen",
                   min_size=96, max_size=128, pretrained_backbone=path)
    model, frozen = build_model(cfg, 21)
    canvases = default_canvases(cfg.min_size, cfg.max_size)
    group_ids = create_aspect_ratio_groups(ds.aspect_ratios(),
                                           cfg.aspect_ratio_group_factor)
    pool = ALPoolState.initial(len(ds), cfg.init_num, cfg.seed)
    state = _fresh_state(cfg, model, frozen, ds, pool, canvases, group_ids,
                         cycle=0)
    np.testing.assert_allclose(
        np.asarray(state.params["backbone"]["conv1"]["kernel"]),
        torch_conv_to_flax(np.asarray(sd["conv1.weight"])), rtol=1e-6)
    # frozen BN stats came along too
    np.testing.assert_allclose(
        np.asarray(state.frozen["backbone"]["FrozenBatchNorm_0"]["mean"]),
        np.asarray(sd["bn1.running_mean"]), rtol=1e-6)
