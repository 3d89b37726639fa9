"""Benchmark: CALD pool-scoring throughput (the reference's hot loop, SURVEY §3.2).

Measures images/sec for the full CALD scoring pipeline — base detect, 4 default
augmentations built on device, 4 augmented detects, consistency kernel — on the
flagship Faster R-CNN ResNet-50-FPN at VOC resolution (canvas 640x1024).

The reference scores serially at batch 1 with host-side PIL augmentation and
scipy JS (~3 img/s on one GPU is the generous estimate recorded in BASELINE.md);
``vs_baseline`` is measured-throughput / 3.0.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

from __future__ import annotations

import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

REFERENCE_IMG_PER_SEC = 3.0


def build(batch_size: int, canvas_hw=(640, 1024), num_classes: int = 21,
          model_name: str = "faster"):
    from cald_tpu.models import (
        fasterrcnn_resnet50_fpn_feature, retinanet_resnet50_fpn_cal,
    )
    from cald_tpu.strategies import CALDConfig, make_cald_score_fn

    if model_name == "retina":
        model = retinanet_resnet50_fpn_cal(num_classes)
    else:
        # the driver's default fast-scoring counts (cli/config.py
        # score_rpn_pre_nms/score_rpn_post_nms; training/eval keep 1000/1000)
        model = fasterrcnn_resnet50_fpn_feature(
            num_classes=num_classes,
            rpn_pre_nms_top_n_test=400, rpn_post_nms_top_n_test=256)
    h, w = canvas_hw
    images = jnp.zeros((batch_size, h, w, 3), jnp.float32)
    valid_hw = jnp.asarray([[600, 1000]] * batch_size, jnp.int32)
    variables = jax.jit(model.init)(jax.random.key(0), images[:2], valid_hw[:2])
    score_fn = make_cald_score_fn(model, CALDConfig(), num_classes)
    return score_fn, variables


def run(batch_size: int = 8, iters: int = 10, canvas_hw=(640, 1024),
        model_name: str = "faster") -> dict:
    score_fn, variables = build(batch_size, canvas_hw, model_name=model_name)
    h, w = canvas_hw
    rng = np.random.default_rng(0)
    images = jnp.asarray(rng.uniform(0, 255, (batch_size, h, w, 3)), jnp.float32)
    valid_hw = jnp.asarray([[600, 1000]] * batch_size, jnp.int32)

    # warmup (compile)
    c, corr = score_fn(variables, images, valid_hw, jax.random.key(0))
    np.asarray(c)

    # NOTE: device_get per iteration, not block_until_ready at the end — the
    # axon remote-execution backend's block_until_ready does not flush its
    # async queue (verified empirically: a 1.66s call "completes" in ms).
    t0 = time.perf_counter()
    for i in range(iters):
        c, corr = score_fn(variables, images, valid_hw, jax.random.key(i + 1))
        np.asarray(c)
    dt = time.perf_counter() - t0
    img_per_sec = batch_size * iters / dt
    return {
        "metric": "cald_pool_scoring_throughput",
        "value": round(img_per_sec, 2),
        "unit": "images/sec/chip",
        "vs_baseline": round(img_per_sec / REFERENCE_IMG_PER_SEC, 2),
    }


def main():
    batch_size = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    # optional second arg: "faster" (default, the driver-recorded metric)
    # or "retina" for the RetinaNet family
    model_name = sys.argv[2] if len(sys.argv) > 2 else "faster"
    try:
        result = run(batch_size=batch_size, model_name=model_name)
    except Exception as e:  # OOM etc: retry smaller before giving up
        if batch_size > 1:
            result = run(batch_size=max(1, batch_size // 4),
                         model_name=model_name)
            result["note"] = f"fallback batch after: {type(e).__name__}"
        else:
            raise
    if model_name != "faster":
        result["metric"] += f"_{model_name}"
    print(json.dumps(result))


if __name__ == "__main__":
    main()
