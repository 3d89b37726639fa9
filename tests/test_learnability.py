"""End-to-end TRAINING-SIGNAL test: the tiny detector must actually learn a
trivially learnable dataset (color-coded rectangles), reaching high per-class
AP50 — validates anchors, matching, sampling, losses, postprocess, and eval
together. (The class MEAN stays low by design: the reference's VOC protocol
averages over all 20 classes including absent ones, voc_eval.py:258-266.)
"""

import numpy as np
import pytest

from cald_tpu.cli.config import ALConfig
from cald_tpu.cli.driver import al_loop
from cald_tpu.data import get_voc2007
from cald_tpu.data.synthetic import make_learnable_voc


@pytest.mark.slow
def test_tiny_frcnn_learns_colored_boxes(tmp_path):
    root = make_learnable_voc(tmp_path, num_images=32)
    ds = get_voc2007(root, "trainval")
    cfg = ALConfig(
        dataset="voc2007", data_path=root, model="faster", strategy="random",
        tiny=True, norm="group", cycles=1, epochs=30, batch_size=4,
        init_num=32, budget_num=1, score_batch_size=4, workers=4,
        min_size=96, max_size=128, max_boxes=8, print_freq=100000,
        lr=0.005, lr_steps=(20, 26), aspect_ratio_group_factor=0).resolve()
    # 30 epochs measured: per-class AP50 0.97-1.0 (60 epochs adds nothing;
    # 20 epochs still passes at ~0.91 — margin kept for backend variance).
    # lr 0.01 -> 0.005 round 5: the original lr NaN'd at the SAME commit it
    # was green at in round 4 — an XLA-CPU numerics shift in the image, not
    # a repo regression (verified via a dd14b61 worktree); the test's claim
    # (training signal learns a learnable set) is lr-agnostic
    hist = al_loop(cfg, datasets=(ds, ds))
    per_class = hist[0]["eval"]["per_class_ap50"]
    present = {k: v for k, v in per_class.items()
               if k in ("aeroplane", "bicycle", "bird")}
    assert all(v > 0.7 for v in present.values()), present
    assert np.mean(list(present.values())) > 0.85, present
