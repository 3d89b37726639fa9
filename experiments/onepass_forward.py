"""VERDICT r4 item 7: is one (1+A)*B detector forward faster than the
separate B (base) + A*B (augs) forwards the scorer runs today?

Inside ``score_batch`` the base forward and the aug-group forward are
sequential XLA subcomputations of the SAME jitted program
(strategies/cald.py:134,154) — the data dependency (augs are built from the
base detections) forces the split in the real scorer, so a win here would
motivate a cross-batch software pipeline (batch k's augs fused with batch
k+1's base). This experiment measures the ceiling: identical FLOPs, one
fused batch vs the split.

Usage: python experiments/onepass_forward.py [B] [A]
"""

from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np


def timeit(fn, args, iters=8):
    out = fn(*args)
    np.asarray(jax.tree.leaves(out)[0])      # flush (block_until_ready lies
    t0 = time.perf_counter()                 # on the axon backend, PERF.md)
    pending = None
    for _ in range(iters):
        out = fn(*args)
        if pending is not None:
            np.asarray(pending)
        pending = jax.tree.leaves(out)[0]
    np.asarray(pending)
    return (time.perf_counter() - t0) / iters


def main():
    b = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    a = int(sys.argv[2]) if len(sys.argv) > 2 else 4

    from cald_tpu.models import fasterrcnn_resnet50_fpn_feature

    model = fasterrcnn_resnet50_fpn_feature(num_classes=21)
    h, w = 640, 1024
    rng = np.random.default_rng(0)
    imgs = jnp.asarray(rng.uniform(0, 255, (b * (1 + a), h, w, 3)), jnp.float32)
    hw = jnp.asarray([[600, 1000]] * (b * (1 + a)), jnp.int32)
    variables = jax.jit(model.init)(jax.random.key(0), imgs[:2], hw[:2])

    @jax.jit
    def split(v, im, vh):
        d1 = model.apply(v, im[:b], vh[:b], method="detect")
        d2 = model.apply(v, im[b:], vh[b:], method="detect")
        return d1.scores.sum() + d2.scores.sum()

    @jax.jit
    def merged(v, im, vh):
        d = model.apply(v, im, vh, method="detect")
        return d.scores.sum()

    t_split = timeit(split, (variables, imgs, hw))
    t_merged = timeit(merged, (variables, imgs, hw))
    n = b * (1 + a)
    print(f"B={b} A={a} ({n} forwards/iter)")
    print(f"  split  (B + A*B): {t_split * 1e3:8.1f} ms/iter "
          f"({t_split / n * 1e6:6.1f} us/forward)")
    print(f"  merged ((1+A)*B): {t_merged * 1e3:8.1f} ms/iter "
          f"({t_merged / n * 1e6:6.1f} us/forward)")
    print(f"  merged/split: {t_merged / t_split:.4f}")


if __name__ == "__main__":
    main()
