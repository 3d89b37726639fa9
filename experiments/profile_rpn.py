"""RPN proposal-stage variant timing (faithful counts: pre/post-NMS 1000).

The faithful scoring program spends ~1.1 ms/img in the RPN stage on top of the
backbone (PERF.md round-3 breakdown). Two suspected latency sinks, measured
here as fused-program deltas (PERF.md measurement rules):

  * per-level exact top-1000 over up to 123k objectness scores
    (``jax.lax.top_k`` is sort-based on TPU; ``jax.lax.approx_max_k`` with
    ``recall_target=1.0`` lowers to the PartialReduce TPU op — exact result,
    different schedule);
  * the tiled-NMS outer loop: 4096 candidates / TILE=128 -> 32 sequential
    steps, each tiny (latency-, not compute-bound). Bigger tiles trade step
    count for per-step IoU block size.

Variants are injected by monkeypatching BEFORE the jit trace; run one variant
per process:

    python experiments/profile_rpn.py baseline [B]
    python experiments/profile_rpn.py approx_topk [B]
    python experiments/profile_rpn.py tile256 [B]
    python experiments/profile_rpn.py tile512 [B]
    python experiments/profile_rpn.py approx_topk+tile256 [B]
"""

from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np


def apply_variant(name: str):
    import cald_tpu.ops.nms as nms_mod

    for part in name.split("+"):
        if part == "baseline":
            continue
        elif part == "approx_topk":
            import cald_tpu.models.rpn as rpn_mod

            orig = jax.lax.top_k

            class _LaxProxy:
                def __getattr__(self, attr):
                    if attr == "top_k":
                        return lambda o, k: jax.lax.approx_max_k(
                            o, k, recall_target=1.0)
                    return getattr(jax.lax, attr)

            class _JaxProxy:
                lax = _LaxProxy()

                def __getattr__(self, attr):
                    return getattr(jax, attr)

            rpn_mod.jax = _JaxProxy()
            del orig
        elif part.startswith("tile"):
            t = int(part[4:])
            # nms() pads candidates to a multiple of nms_mod.TILE before the
            # suppression loop — keep the pad and the loop tile in sync or
            # the floor-divided loop drops remainder tiles
            nms_mod.TILE = t
            nms_mod._suppress = (
                lambda sboxes, salive, thr, _t=t:
                nms_mod._tiled_suppression(sboxes, salive, thr, tile=_t))
        else:
            raise SystemExit(f"unknown variant part: {part}")


def main():
    variant = sys.argv[1] if len(sys.argv) > 1 else "baseline"
    b = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    apply_variant(variant)

    from cald_tpu.models import fasterrcnn_resnet50_fpn_feature

    h, w = 640, 1024
    model = fasterrcnn_resnet50_fpn_feature(21)
    rng = np.random.default_rng(0)
    images = jnp.asarray(rng.uniform(0, 255, (b, h, w, 3)), jnp.float32)
    valid_hw = jnp.asarray([[600, 1000]] * b, jnp.int32)
    variables = jax.jit(model.init)(jax.random.key(0), images[:2],
                                    valid_hw[:2])

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

    t_f = timeit(feats_only, (variables, images)) * 1000 / b
    t_r = timeit(feats_rpn, (variables, images, valid_hw)) * 1000 / b
    # parity spot check: proposals sum should match baseline bit-for-bit for
    # exact variants (approx_max_k@recall=1.0 and any tile size). Reuses the
    # already-compiled feats_rpn program — an eager apply would dispatch
    # per-primitive at ~30 ms each on the remote-exec backend (hours), and a
    # smaller-shape jit would recompile for minutes.
    chk = float(feats_rpn(variables, images, valid_hw))
    print(f"variant={variant} B={b}  backbone {t_f:.2f} ms/img  "
          f"+RPN {t_r - t_f:+.2f} ms/img  (total {t_r:.2f})  check={chk:.3f}",
          flush=True)


if __name__ == "__main__":
    main()
