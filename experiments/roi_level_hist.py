"""Fact-gathering for the full-level-matmul RoIAlign (VERDICT r4 item 1):
what is the FPN-level distribution of the rois the RoI stage actually sees in
the bench program? The formulation's cost is strongly level-dependent
(y-contraction FLOPs scale with H_l*W_l), so the win hinges on how many rois
sit at P2 vs P3-P5.

Usage: python experiments/roi_level_hist.py [B] [post_nms]
"""

from __future__ import annotations

import sys

import jax
import jax.numpy as jnp
import numpy as np


def main():
    b = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    post = int(sys.argv[2]) if len(sys.argv) > 2 else 1000

    from cald_tpu.models import fasterrcnn_resnet50_fpn_feature
    from cald_tpu.ops.roi_align import fpn_level_assignment

    model = fasterrcnn_resnet50_fpn_feature(
        num_classes=21, rpn_pre_nms_top_n_test=1000,
        rpn_post_nms_top_n_test=post)
    h, w = 640, 1024
    rng = np.random.default_rng(0)
    images = jnp.asarray(rng.uniform(0, 255, (b, h, w, 3)), jnp.float32)
    valid_hw = jnp.asarray([[600, 1000]] * b, jnp.int32)
    variables = jax.jit(model.init)(jax.random.key(0), images[:2], valid_hw[:2])

    def f(mdl, images, valid_hw):
        pyr = mdl._features(images, valid_hw)
        _, _, _, props, _, pvalid = mdl._proposals(pyr, valid_hw, train=False)
        return props, pvalid

    props, pvalid = jax.jit(
        lambda v, im, hw: model.apply(v, im, hw, method=f))(
            variables, images, valid_hw)
    props = np.asarray(props)
    pvalid = np.asarray(pvalid)
    lv = np.asarray(jax.vmap(fpn_level_assignment)(jnp.asarray(props)))
    lv = lv[pvalid]
    hist = np.bincount(lv.reshape(-1), minlength=4)
    tot = hist.sum()
    print(f"B={b} post={post} valid rois={tot} "
          f"({tot / (b * post) * 100:.0f}% of slots)")
    for i, n in enumerate(hist):
        print(f"  P{i + 2}: {n:6d}  ({n / max(tot, 1) * 100:5.1f}%)")
    ws = props[..., 2] - props[..., 0]
    hs = props[..., 3] - props[..., 1]
    s = np.sqrt(np.maximum(ws * hs, 0))[pvalid]
    print(f"  sqrt(area): p10/p50/p90 = {np.percentile(s, [10, 50, 90])}")


if __name__ == "__main__":
    main()
