"""Active-learning strategies (reference L4/L5 scoring + selection logic).

Each strategy exposes a uniform interface used by the AL driver:

    score_pool(...)  -> per-image informativeness arrays (device-batched)
    select(...)      -> chosen pool positions given a budget

CALD is the flagship: the reference's serial batch-1, (1+N_aug)-forwards-per-
image Python loop (/root/reference/cald_train.py:91-231) becomes one jitted
program per pool batch — base forward, device-side augmentations, augmented
forwards, and the consistency kernel all fused into a single XLA pipeline.
"""

from cald_tpu.strategies.cald import (
    CALDConfig,
    cald_select,
    cls_kldiv_rank,
    labeled_class_counts,
    make_cald_score_fn,
    score_pool,
    subsample_reference,
)
from cald_tpu.strategies.random_strategy import random_select
from cald_tpu.strategies.ltc import ltc_scores, make_ltc_score_fn
from cald_tpu.strategies.lsc import lsc_scores, make_lsc_score_fn
from cald_tpu.strategies.ll4al import make_ll_score_fn, make_ll_train_step
from cald_tpu.strategies.vaal import VAALTrainer, vaal_select
from cald_tpu.strategies.ssm import SSMConfig, ssm_select

__all__ = [
    "CALDConfig",
    "make_cald_score_fn",
    "score_pool",
    "subsample_reference",
    "labeled_class_counts",
    "cls_kldiv_rank",
    "cald_select",
    "random_select",
    "make_ltc_score_fn",
    "ltc_scores",
    "make_lsc_score_fn",
    "lsc_scores",
    "make_ll_score_fn",
    "make_ll_train_step",
    "VAALTrainer",
    "vaal_select",
    "SSMConfig",
    "ssm_select",
]
