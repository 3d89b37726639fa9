"""cald_tpu — TPU-native consistency-based active learning for object detection.

A ground-up JAX/XLA/Pallas re-design of the capabilities of we1pingyu/CALD
(arXiv:2103.10374): Faster R-CNN / RetinaNet detectors as Flax modules, the CALD
augmentation + consistency scoring pipeline as batched device kernels, and the full
active-learning cycle (train -> score pool -> select budget -> relabel) driven by a
single structured config.

Layering (bottom-up):
  ops/        geometry + detection kernels (IoU, NMS, RoIAlign, JS, consistency)
  augment/    device-side CALD augmentations (flip, resize, rotate, cutout, noise)
  data/       VOC/COCO parsing, padded batching, AL pool bookkeeping
  models/     Flax detectors (ResNet-50/MobileNetV3 FPN backbones, RPN, RoI heads,
              RetinaNet head) with the CALD extras (props, prob_max, scores_cls)
  engine/     pjit train/eval steps, LR schedules, checkpointing (incl. AL state)
  strategies/ CALD + random / LL4AL / VAAL / SSM / LT-C / LS-C selection
  parallel/   mesh + sharding helpers (pool sharding over ICI)
  cli/        reference-compatible command line front end
"""

__version__ = "0.1.0"
