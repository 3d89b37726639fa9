"""Benchmark: CALD pool-scoring throughput (the reference's hot loop, SURVEY §3.2).

Measures images/sec for the full CALD scoring pipeline — base detect, 4 default
augmentations built on device, 4 augmented detects, consistency kernel — on the
flagship Faster R-CNN ResNet-50-FPN at VOC resolution (canvas 640x1024).

The reference scores serially at batch 1 with host-side PIL augmentation and
scipy JS (~3 img/s on one GPU is the generous estimate recorded in BASELINE.md);
``vs_baseline`` is measured-throughput / 3.0.

Usage:
    python bench.py             # driver default: floor-gated post-NMS 768
                                # trim for Faster R-CNN (EXPERIMENTS.md r4)
    python bench.py --faithful  # reference-exact counts (1000/1000)
    python bench.py --fast      # deeper opt-in fast counts (400/256)
    python bench.py --model retina      # retina driver default = faithful
    python bench.py -b 16 --rpn-pre 400 --rpn-post 256

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

from __future__ import annotations

import argparse
import json
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

REFERENCE_IMG_PER_SEC = 3.0
# TPU v5e (v5 lite) peak dense bf16 matmul throughput, for MFU accounting.
V5E_PEAK_BF16_TFLOPS = 197.0


def build(batch_size: int, canvas_hw=(640, 1024), num_classes: int = 21,
          model_name: str = "faster", rpn_pre: int = 0, rpn_post: int = 0):
    from cald_tpu.models import (
        fasterrcnn_resnet50_fpn_feature, retinanet_mobilenet,
        retinanet_resnet50_fpn_cal,
    )
    from cald_tpu.strategies import CALDConfig, make_cald_score_fn

    if model_name.startswith("retina"):
        factory = (retinanet_mobilenet if "mobile" in model_name
                   else retinanet_resnet50_fpn_cal)
        model = factory(num_classes)
        if rpn_post:  # the retina fast-scoring analog trims its head counts
            from cald_tpu.cli.config import ALConfig
            from cald_tpu.cli.driver import _scoring_model

            model = _scoring_model(
                ALConfig(model="retina", score_rpn_pre_nms=rpn_pre,
                         score_rpn_post_nms=rpn_post), model)
    else:
        # defaults mirror the driver's reference-faithful scoring (cli/
        # config.py score_rpn_{pre,post}_nms = 0); --fast / --rpn-post N opt
        # into the trimmed-candidate scoring model (deviation: EXPERIMENTS.md)
        kw = ({} if not rpn_post else
              dict(rpn_pre_nms_top_n_test=rpn_pre,
                   rpn_post_nms_top_n_test=rpn_post))
        model = fasterrcnn_resnet50_fpn_feature(num_classes=num_classes, **kw)
    h, w = canvas_hw
    images = jnp.zeros((batch_size, h, w, 3), jnp.float32)
    valid_hw = jnp.asarray([[600, 1000]] * batch_size, jnp.int32)
    variables = jax.jit(model.init)(jax.random.key(0), images[:2], valid_hw[:2])
    score_fn = make_cald_score_fn(model, CALDConfig(), num_classes)
    return score_fn, variables


def run(batch_size: int = 32, iters: int = 10, canvas_hw=(640, 1024),
        model_name: str = "faster", rpn_pre: int = 0,
        rpn_post: int = 0) -> dict:
    score_fn, variables = build(batch_size, canvas_hw, model_name=model_name,
                                rpn_pre=rpn_pre, rpn_post=rpn_post)
    h, w = canvas_hw
    rng = np.random.default_rng(0)
    images = jnp.asarray(rng.uniform(0, 255, (batch_size, h, w, 3)), jnp.float32)
    valid_hw = jnp.asarray([[600, 1000]] * batch_size, jnp.int32)

    # Analytic FLOPs of the whole scoring program (XLA's own cost model over
    # the optimized HLO: base + 4 aug detector forwards, aug build,
    # consistency kernel). MFU = achieved TFLOP/s over the v5e bf16 peak —
    # the whole-program utilization number (VERDICT r4 item 4; PERF.md has
    # the per-stage derivation).
    flops_per_call = None
    try:
        compiled = score_fn.lower(variables, images, valid_hw,
                                  jax.random.key(0)).compile()
        ca = compiled.cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        flops_per_call = float(ca.get("flops", 0.0)) or None
    except Exception:
        pass

    # warmup (compile)
    c, corr = score_fn(variables, images, valid_hw, jax.random.key(0))
    np.asarray(c)

    # Pipelined timing loop: keep one batch in flight so host-side dispatch
    # (~30 ms fixed per call on this backend) overlaps device compute — the
    # shape of the real driver loop, where the loader prefetches while the
    # device scores. NOTE: device_get per iteration, not block_until_ready at
    # the end — the axon remote-execution backend's block_until_ready does not
    # flush its async queue (verified empirically).
    t0 = time.perf_counter()
    pending = None
    for i in range(iters):
        c, corr = score_fn(variables, images, valid_hw, jax.random.key(i + 1))
        if pending is not None:
            np.asarray(pending)
        pending = c
    np.asarray(pending)
    dt = time.perf_counter() - t0
    img_per_sec = batch_size * iters / dt
    flm_on = (jax.default_backend() in ("tpu", "axon")
              and os.environ.get("CALD_TPU_ROI_FLM", "1") == "1"
              and model_name == "faster")
    result = {
        "metric": "cald_pool_scoring_throughput",
        "value": round(img_per_sec, 2),
        "unit": "images/sec/chip",
        "vs_baseline": round(img_per_sec / REFERENCE_IMG_PER_SEC, 2),
        "roi_kernel": ("flm" if flm_on else "window") if model_name == "faster"
                      else "n/a",
    }
    if flops_per_call:
        achieved_tflops = flops_per_call * iters / dt / 1e12
        result.update({
            "gflops_per_image": round(flops_per_call / batch_size / 1e9, 1),
            "achieved_tflops": round(achieved_tflops, 2),
            "mfu": round(achieved_tflops / V5E_PEAK_BF16_TFLOPS, 4),
        })
    return result


def main():
    p = argparse.ArgumentParser()
    p.add_argument("batch_pos", nargs="?", type=int, default=None,
                   help="legacy positional batch size")
    p.add_argument("model_pos", nargs="?", default=None,
                   help="legacy positional model name")
    p.add_argument("-b", "--batch", type=int, default=32)
    p.add_argument("--model", default="faster",
                   choices=["faster", "retina", "retina_mobilenet"])
    p.add_argument("--iters", type=int, default=10)
    p.add_argument("--rpn-pre", type=int, default=0,
                   help="fast-scoring RPN pre-NMS top-n (0 = faithful 1000)")
    p.add_argument("--rpn-post", type=int, default=0,
                   help="fast-scoring RPN post-NMS top-n (0 = faithful 1000)")
    p.add_argument("--fast", action="store_true",
                   help="shorthand for --rpn-pre 400 --rpn-post 256")
    p.add_argument("--faithful", action="store_true",
                   help="force reference-faithful counts (1000/1000), "
                        "overriding the driver-default 768 trim")
    args = p.parse_args()
    if args.fast and not args.rpn_post:
        args.rpn_pre, args.rpn_post = 400, 256
    batch_size = args.batch_pos if args.batch_pos is not None else args.batch
    model_name = args.model_pos if args.model_pos is not None else args.model
    explicit_trim = bool(args.rpn_post)
    if args.faithful:
        args.rpn_pre = args.rpn_post = 0
    # driver default (cli/config.py resolve(), round 5) = reference-faithful
    # counts for every model: with the flm RoI kernel the post-768 trim is
    # worth only +2.8%, so faithful IS the default path — no mirror needed
    try:
        result = run(batch_size=batch_size, iters=args.iters,
                     model_name=model_name, rpn_pre=args.rpn_pre,
                     rpn_post=args.rpn_post)
    except Exception as e:  # OOM etc: retry smaller before giving up
        if batch_size > 1:
            result = run(batch_size=max(1, batch_size // 4),
                         model_name=model_name, rpn_pre=args.rpn_pre,
                         rpn_post=args.rpn_post)
            result["note"] = f"fallback batch after: {type(e).__name__}"
        else:
            raise
    if model_name != "faster":
        result["metric"] += f"_{model_name}"
    if args.faithful:
        result["metric"] += "_faithful"
    elif explicit_trim:
        result["metric"] += "_fast"
    print(json.dumps(result))


if __name__ == "__main__":
    main()
