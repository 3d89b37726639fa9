"""RoIAlign window-DMA pipeline depth: does >1 outstanding copy break the floor?

PERF.md round 3 pinned the faithful path's dominant cost to a ~3.5 us/roi
floor in the Pallas RoIAlign kernel, with DMA-only ~= compute-only ~= full
time. The double-buffered kernel keeps exactly ONE window copy outstanding;
if the DMA engine pipelines independent copies, a deeper round-robin
(CALD_TPU_ROI_NSLOTS=4/8) overlaps several and the DMA side of the floor
drops. One variant per process (PERF.md measurement rules):

    CALD_TPU_ROI_NSLOTS=2 python experiments/profile_roi_slots.py [R] [B]
    CALD_TPU_ROI_NSLOTS=4 python experiments/profile_roi_slots.py
    CALD_TPU_ROI_NSLOTS=8 python experiments/profile_roi_slots.py

Measures (a) the isolated roi-align stage at R rois (fused program, scalar-
reduced output) and (b) parity vs the XLA points path at the same rois.
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
    nslots = os.environ.get("CALD_TPU_ROI_NSLOTS", "2")

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

    # parity vs the points path (bf16-class tolerance)
    got = jax.vmap(lambda a, b_, c, d, e: pallas_multi_scale_roi_align(
        [a, b_, c, d], e, spatial_scales=scales))(*feats, rois)
    ref = jax.vmap(lambda a, b_, c, d, e: multi_scale_roi_align(
        [a, b_, c, d], e, spatial_scales=scales, method="points"))(*feats, rois)
    err = float(jnp.max(jnp.abs(got.astype(jnp.float32)
                                - ref.astype(jnp.float32))))

    out = stage(*feats, rois)
    np.asarray(out)  # compile + warmup
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
    print(f"nslots={nslots} R={r} B={b}: {dt * 1000:.2f} ms/call, "
          f"{us_per_roi:.2f} us/roi, max|err| vs points = {err:.4f}")


if __name__ == "__main__":
    main()
