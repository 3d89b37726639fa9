"""A/B the full-level-matmul RoI path against the window-DMA kernel on the
detector forward (the scoring program's unit of cost).

Times jit(detect) at faithful counts (RPN 1000/1000) with
CALD_TPU_ROI_FLM=0/1 in one process (the flag is read at trace time).

Usage: python experiments/flm_bench.py [B] [post_nms]
"""

from __future__ import annotations

import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np


def timeit(fn, args, iters=8):
    out = fn(*args)
    np.asarray(jax.tree.leaves(out)[0])
    t0 = time.perf_counter()
    pending = None
    for _ in range(iters):
        out = fn(*args)
        if pending is not None:
            np.asarray(pending)
        pending = jax.tree.leaves(out)[0]
    np.asarray(pending)
    return (time.perf_counter() - t0) / iters


def main():
    b = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    post = int(sys.argv[2]) if len(sys.argv) > 2 else 1000

    from cald_tpu.models import fasterrcnn_resnet50_fpn_feature

    model = fasterrcnn_resnet50_fpn_feature(
        num_classes=21, rpn_pre_nms_top_n_test=1000,
        rpn_post_nms_top_n_test=post)
    h, w = 640, 1024
    rng = np.random.default_rng(0)
    images = jnp.asarray(rng.uniform(0, 255, (b, h, w, 3)), jnp.float32)
    valid_hw = jnp.asarray([[600, 1000]] * b, jnp.int32)
    variables = jax.jit(model.init)(jax.random.key(0), images[:2],
                                    valid_hw[:2])

    results = {}
    dets = {}
    for flag in ("0", "1"):
        os.environ["CALD_TPU_ROI_FLM"] = flag
        f = jax.jit(lambda v, im, hw: model.apply(v, im, hw, method="detect"))
        t = timeit(f, (variables, images, valid_hw))
        results[flag] = t
        d = f(variables, images, valid_hw)
        dets[flag] = jax.tree.map(np.asarray, d)
        print(f"  ROI_FLM={flag}: {t * 1e3:8.2f} ms/iter "
              f"({t / b * 1e3:6.2f} ms/img)", flush=True)
    print(f"  flm/window: {results['1'] / results['0']:.4f}")
    # output agreement on the valid detections (bf16 matmul-order deltas)
    v0, v1 = dets["0"].valid, dets["1"].valid
    print(f"  valid dets: window {v0.sum()} flm {v1.sum()} "
          f"(mask equal: {bool((v0 == v1).all())})")
    both = v0 & v1
    if both.any():
        for name in ("boxes", "scores", "prob_max"):
            a, c = getattr(dets["0"], name), getattr(dets["1"], name)
            print(f"  max|d {name}|: {np.abs(a[both] - c[both]).max():.3e}")


if __name__ == "__main__":
    main()
