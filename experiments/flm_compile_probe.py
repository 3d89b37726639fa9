"""Compile-time bisection for the flm RoIAlign kernel on the real backend.

The first TPU compile attempt (full VOC shapes, g=8, c=256) blew past 25
minutes. This probe compiles the kernel alone at growing (level shapes, c, g)
configs and prints wall-clock per compile, so the explosion can be localized
(suspects: the (g,7,W,C)->(g,W,7,C) Mosaic relayout at W=256, the
N=W*C=65536-wide dot tiling, the 4-branch unroll).

Usage: python experiments/flm_compile_probe.py [config ...]
  configs: small | mid | c256 | w256 | g4 | g8full ... (default: escalate)
"""

from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

CONFIGS = {
    # name: (level shapes, c, g, n)
    "small": ([(40, 64), (20, 32)], 128, 4, 32),
    # single-variable escalations from `small` (compile-time bisection)
    "smallg8": ([(40, 64), (20, 32)], 128, 8, 32),
    "smallL4": ([(40, 64), (20, 32), (10, 16), (5, 8)], 128, 4, 32),
    "smallW128": ([(80, 128), (40, 64)], 128, 4, 32),
    "smallW256": ([(160, 256), (80, 128)], 128, 4, 32),
    "smallC256": ([(40, 64), (20, 32)], 256, 4, 32),
    "mid": ([(80, 128), (40, 64), (20, 32), (10, 16)], 128, 8, 64),
    "c256": ([(80, 128), (40, 64), (20, 32), (10, 16)], 256, 8, 64),
    "w256g4": ([(160, 256), (80, 128), (40, 64), (20, 32)], 256, 4, 64),
    "w256g8": ([(160, 256), (80, 128), (40, 64), (20, 32)], 256, 8, 64),
    "full": ([(160, 256), (80, 128), (40, 64), (20, 32)], 256, 8, 1000),
    "fullg4": ([(160, 256), (80, 128), (40, 64), (20, 32)], 256, 4, 1000),
}


def probe(name):
    from cald_tpu.ops.flm_roi_align import flm_multi_scale_roi_align

    shapes, c, g, n = CONFIGS[name]
    b = 2
    rng = np.random.default_rng(0)
    feats = [jnp.asarray(rng.normal(0, 1, (b, h, w, c)), jnp.bfloat16)
             for h, w in shapes]
    scales = [0.25 / 2 ** i for i in range(len(shapes))]
    rois = jnp.asarray(rng.uniform(10, 300, (b, n, 4)), jnp.float32)
    rois = rois.at[..., 2:].set(rois[..., :2] + rois[..., 2:])
    valid = jnp.ones((b, n), bool)

    f = jax.jit(lambda fs, r, v: flm_multi_scale_roi_align(
        fs, r, v, spatial_scales=scales, group=g)[0])
    t0 = time.perf_counter()
    lowered = f.lower(feats, rois, valid)
    t1 = time.perf_counter()
    compiled = lowered.compile()
    t2 = time.perf_counter()
    print(f"{name}: lower {t1 - t0:.1f}s compile {t2 - t1:.1f}s", flush=True)
    out = compiled(feats, rois, valid)
    np.asarray(out)
    print(f"{name}: executed ok, out {out.shape}", flush=True)


if __name__ == "__main__":
    names = sys.argv[1:] or ["small", "mid", "c256", "w256g4", "w256g8"]
    for nm in names:
        probe(nm)
