"""Stage breakdown of the CALD scoring program (PERF.md measurement rules:
one fused jitted program per variant, scalar-reduced outputs, np.asarray to
flush the remote queue, pipelined-call overhead excluded by timing many iters).

    python experiments/profile_scoring.py [B] [post] [pre]

Prints per-stage ms/img deltas for the fast-scoring FRCNN model.
"""

from __future__ import annotations

import sys
import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from cald_tpu.augment import build_aug_batch
from cald_tpu.models import fasterrcnn_resnet50_fpn_feature
from cald_tpu.strategies import CALDConfig, make_cald_score_fn
from cald_tpu.strategies.cald import subsample_reference


def timeit(fn, args, iters=8, label=""):
    out = fn(*args)
    np.asarray(jax.tree.leaves(out)[0])      # warmup + compile
    t0 = time.perf_counter()
    pending = None
    for _ in range(iters):
        out = fn(*args)
        red = jax.tree.leaves(out)[0]
        if pending is not None:
            np.asarray(pending)
        pending = red
    np.asarray(pending)
    dt = (time.perf_counter() - t0) / iters
    return dt


def main():
    b = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    post = int(sys.argv[2]) if len(sys.argv) > 2 else 256
    pre = int(sys.argv[3]) if len(sys.argv) > 3 else 400
    h, w = 640, 1024
    kw = dict(rpn_pre_nms_top_n_test=pre, rpn_post_nms_top_n_test=post) if post else {}
    model = fasterrcnn_resnet50_fpn_feature(21, **kw)
    rng = np.random.default_rng(0)
    images = jnp.asarray(rng.uniform(0, 255, (b, h, w, 3)), jnp.float32)
    valid_hw = jnp.asarray([[600, 1000]] * b, jnp.int32)
    variables = jax.jit(model.init)(jax.random.key(0), images[:2], valid_hw[:2])

    def reduce_det(d):
        return (jnp.sum(d.boxes.astype(jnp.float32)) + jnp.sum(d.scores)
                + jnp.sum(d.valid))

    @jax.jit
    def feats_only(v, im):
        py = model.apply(v, im, method="extract_features")
        return sum(jnp.sum(p.astype(jnp.float32)) for p in py)

    @jax.jit
    def feats_rpn(v, im, hw):
        py = model.apply(v, im, method="extract_features")
        _, _, _, props, pscores, pvalid = model.apply(
            v, py, hw, train=False, method="_proposals")
        return jnp.sum(props) + jnp.sum(pscores) + jnp.sum(pvalid)

    @jax.jit
    def full_detect(v, im, hw):
        return reduce_det(model.apply(v, im, hw, method="detect"))

    ccfg = CALDConfig()

    @jax.jit
    def detect_plus_augbuild(v, im, hw, key):
        base = model.apply(v, im, hw, method="detect")
        sub = jax.vmap(partial(subsample_reference, k_ref=ccfg.k_ref,
                               threshold=ccfg.subsample_threshold))(
            base.boxes, base.scores, base.labels, base.scores_cls,
            base.prob_max, base.valid)
        aug_images, aug_boxes, aug_hw = build_aug_batch(
            im.astype(jnp.bfloat16), sub[0], sub[5], hw, key,
            tuple(ccfg.aug_names))
        return (jnp.sum(aug_images.astype(jnp.float32)) + jnp.sum(aug_boxes)
                + jnp.sum(aug_hw))

    score_fn = make_cald_score_fn(model, ccfg, 21)

    key = jax.random.key(1)
    t_f = timeit(feats_only, (variables, images)) * 1000 / b
    t_r = timeit(feats_rpn, (variables, images, valid_hw)) * 1000 / b
    t_d = timeit(full_detect, (variables, images, valid_hw)) * 1000 / b
    t_a = timeit(detect_plus_augbuild, (variables, images, valid_hw, key)) * 1000 / b
    t_s = timeit(score_fn, (variables, images, valid_hw, key)) * 1000 / b

    print(f"B={b} post={post} pre={pre}  (ms/img)")
    print(f"  backbone+FPN            {t_f:6.2f}")
    print(f"  + RPN head+proposals    {t_r:6.2f}  (Δ {t_r - t_f:+.2f})")
    print(f"  + RoI+box head+post     {t_d:6.2f}  (Δ {t_d - t_r:+.2f})")
    print(f"  + subsample+aug build   {t_a:6.2f}  (Δ {t_a - t_d:+.2f})")
    print(f"  full score (5 fwd)      {t_s:6.2f}  (Δ {t_s - t_a:+.2f}; "
          f"4 aug detects ≈ {4 * t_d:.2f})")
    print(f"  -> implied consistency+corr misc: {t_s - t_a - 4 * t_d:+.2f}")
    print(f"  throughput {1000.0 / t_s:.1f} img/s")


if __name__ == "__main__":
    main()
