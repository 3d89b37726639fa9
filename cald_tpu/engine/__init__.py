"""Training/eval engine: optax schedules + SGD, jitted train steps, host-side
VOC/COCO evaluation, orbax checkpointing (including AL pool state).

Replaces the reference L3 layer (/root/reference/detection/engine.py, utils.py,
train.py) — see SURVEY.md §2.4. Distribution is a mesh + sharding concern
(``cald_tpu.parallel``), not engine code: the train step is a pure jitted
function; XLA inserts the gradient collectives.
"""

from cald_tpu.engine.schedules import multistep_with_warmup, warmup_factor
from cald_tpu.engine.optim import make_sgd, trainable_mask
from cald_tpu.engine.state import TrainState, create_train_state
from cald_tpu.engine.train import make_train_step, train_one_epoch
from cald_tpu.engine.voc_eval import voc_ap, voc_eval_class, voc_evaluate_detections
from cald_tpu.engine.coco_eval import coco_evaluate_detections
from cald_tpu.engine.evaluate import evaluate, run_inference
from cald_tpu.engine.checkpoint import (load_checkpoint, load_extra,
                                         peek_checkpoint, save_checkpoint)
from cald_tpu.engine.logging import MetricLogger, SmoothedValue

__all__ = [
    "multistep_with_warmup",
    "warmup_factor",
    "make_sgd",
    "trainable_mask",
    "TrainState",
    "create_train_state",
    "make_train_step",
    "train_one_epoch",
    "voc_ap",
    "voc_eval_class",
    "voc_evaluate_detections",
    "coco_evaluate_detections",
    "evaluate",
    "run_inference",
    "save_checkpoint",
    "load_checkpoint",
    "load_extra",
    "peek_checkpoint",
    "MetricLogger",
    "SmoothedValue",
]
