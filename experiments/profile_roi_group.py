"""Grouped-matmul RoIAlign: does attacking DMA bytes + matmul issue cost
TOGETHER break the ~3.8 us/roi floor?

PERF.md round 3 decomposed the faithful path's RoIAlign floor into two
OVERLAPPED ~3.5-4 us costs — window-DMA bytes (44x48x256 bf16 ~= 1.08 MB/roi
at the chip's ~263 GB/s) and per-step compute overhead (M=7-thin matmuls +
relayout) — which is why halving either side alone measured neutral. The
grouped kernel (CALD_TPU_ROI_GROUP=g, ops/pallas_roi_align.py::_group)
shrinks bytes with flat-2D lane-granular size buckets AND amortizes matmul
issue cost with block-diagonal g-roi contractions. One variant per process:

    CALD_TPU_ROI_GROUP={2,4,8} [CALD_TPU_ROI_GROUP_PREC=bf16] \
        PYTHONPATH=/root/repo:/root/.axon_site \
        python experiments/profile_roi_group.py [R] [B]

Measures the isolated stage (fused program, scalar-reduced) and parity vs the
XLA points path — same protocol as profile_roi_slots.py.
"""

from __future__ import annotations

import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np


def main():
    r = int(sys.argv[1]) if len(sys.argv) > 1 else 1000
    b = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    g = os.environ.get("CALD_TPU_ROI_GROUP", "0")
    prec = os.environ.get("CALD_TPU_ROI_GROUP_PREC", "hi")

    from cald_tpu.ops.pallas_roi_align import pallas_multi_scale_roi_align
    from cald_tpu.ops.roi_align import multi_scale_roi_align

    rng = np.random.default_rng(0)
    shapes = [(160, 256), (80, 128), (40, 64), (20, 32)]
    scales = [0.25, 0.125, 0.0625, 0.03125]
    feats = [jnp.asarray(rng.normal(0, 1, (b, h, w, 256)), jnp.bfloat16)
             for h, w in shapes]
    cx = rng.uniform(100, 900, (b, r))
    cy = rng.uniform(80, 560, (b, r))
    sz = rng.uniform(20, 300, (b, r))
    ar = rng.uniform(0.5, 2.0, (b, r))
    w_ = sz * np.sqrt(ar)
    h_ = sz / np.sqrt(ar)
    rois = jnp.asarray(np.stack([cx - w_ / 2, cy - h_ / 2,
                                 cx + w_ / 2, cy + h_ / 2], -1), jnp.float32)

    @jax.jit
    def stage(f0, f1, f2, f3, rr):
        out = jax.vmap(lambda a, b_, c, d, e: pallas_multi_scale_roi_align(
            [a, b_, c, d], e, spatial_scales=scales))(f0, f1, f2, f3, rr)
        return jnp.sum(out.astype(jnp.float32))

    got = jax.vmap(lambda a, b_, c, d, e: pallas_multi_scale_roi_align(
        [a, b_, c, d], e, spatial_scales=scales))(*feats, rois)
    ref = jax.vmap(lambda a, b_, c, d, e: multi_scale_roi_align(
        [a, b_, c, d], e, spatial_scales=scales, method="points"))(*feats, rois)
    err = float(jnp.max(jnp.abs(got.astype(jnp.float32)
                                - ref.astype(jnp.float32))))

    out = stage(*feats, rois)
    np.asarray(out)
    iters = 12
    t0 = time.perf_counter()
    pending = None
    for _ in range(iters):
        o = stage(*feats, rois)
        if pending is not None:
            np.asarray(pending)
        pending = o
    np.asarray(pending)
    dt = (time.perf_counter() - t0) / iters
    us_per_roi = dt / (b * r) * 1e6
    print(f"group={g} prec={prec} R={r} B={b}: {dt * 1000:.2f} ms/call, "
          f"{us_per_roi:.2f} us/roi, max|err| vs points = {err:.4f}")


if __name__ == "__main__":
    main()
