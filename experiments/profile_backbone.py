"""Backbone fusion variants on the scoring path (PERF.md measurement rules).

One variant per process, selected by CALD_TPU_PALLAS_BNECK:

    CALD_TPU_PALLAS_BNECK=      python experiments/profile_backbone.py [B]  # XLA
    CALD_TPU_PALLAS_BNECK=1     python experiments/profile_backbone.py [B]  # per-block
    CALD_TPU_PALLAS_BNECK=stage python experiments/profile_backbone.py [B]  # deep

Measures the fused backbone+FPN program (allow_fused, the detect-path
configuration) and the full detect, each scalar-reduced in-program; prints a
parity delta of the pyramid vs the XLA path computed in the same process.
"""

from __future__ import annotations

import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np


def timeit(fn, args, iters=10):
    out = fn(*args)
    np.asarray(out)
    t0 = time.perf_counter()
    pending = None
    for _ in range(iters):
        out = fn(*args)
        if pending is not None:
            np.asarray(pending)
        pending = out
    np.asarray(pending)
    return (time.perf_counter() - t0) / iters


def main():
    b = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    variant = os.environ.get("CALD_TPU_PALLAS_BNECK", "") or "xla"

    from cald_tpu.models import fasterrcnn_resnet50_fpn_feature

    h, w = 640, 1024
    model = fasterrcnn_resnet50_fpn_feature(21)
    rng = np.random.default_rng(0)
    images = jnp.asarray(rng.uniform(0, 255, (b, h, w, 3)), jnp.float32)
    valid_hw = jnp.asarray([[600, 1000]] * b, jnp.int32)
    variables = jax.jit(model.init)(jax.random.key(0), images[:2],
                                    valid_hw[:2])

    def feats_fused(m, im, hw):
        return sum(jnp.sum(p.astype(jnp.float32))
                   for p in m._features(im, hw, allow_fused=True))

    @jax.jit
    def backbone(v, im, hw):
        return model.apply(v, im, hw, method=feats_fused)

    def reduce_det(d):
        return (jnp.sum(d.boxes.astype(jnp.float32)) + jnp.sum(d.scores)
                + jnp.sum(d.valid))

    @jax.jit
    def full_detect(v, im, hw):
        return reduce_det(model.apply(v, im, hw, method="detect"))

    # parity: fused pyramid vs the exact-XLA pyramid, same process. The
    # dual-backbone program is compile-heavy (the stage-deep Mosaic variant
    # SIGKILLed the remote compile helper, round 4); SKIP_PARITY=1 relies on
    # tests/test_pallas_bottleneck.py instead and measures timing only.
    if os.environ.get("SKIP_PARITY") == "1":
        err = float("nan")
    else:
        def feats_pair(m, im, hw):
            fu = m._features(im, hw, allow_fused=True)
            xl = m._features(im, hw, allow_fused=False)
            return jnp.max(jnp.stack([
                jnp.max(jnp.abs(a.astype(jnp.float32) - c.astype(jnp.float32)))
                for a, c in zip(fu, xl)]))
        err = float(jax.jit(lambda v, im, hw: model.apply(
            v, im, hw, method=feats_pair))(variables, images[:2], valid_hw[:2]))

    t_b = timeit(backbone, (variables, images, valid_hw)) * 1000 / b
    t_d = timeit(full_detect, (variables, images, valid_hw)) * 1000 / b
    print(f"variant={variant} B={b}  backbone+FPN {t_b:.2f} ms/img  "
          f"full detect {t_d:.2f} ms/img  max|fused-xla|={err:.4f}",
          flush=True)


if __name__ == "__main__":
    main()
