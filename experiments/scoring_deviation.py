"""Quantify the fast-scoring deviations against reference-faithful scoring.

The driver's default CALD scoring trims RPN candidates to pre400/post256
(cli/config.py score_rpn_{pre,post}_nms) and detects shrink-resize augs on a
sliced canvas (strategies/cald.py _detect_augs), while the reference scores
through the full post-NMS-1000 eval path (/root/reference/detection/
frcnn_la.py:154-156 via cald_train.py:107). Different proposals -> different
detections -> different consistency scores. This experiment measures whether
that changes anything an AL user can observe: per-image score deltas, rank
correlation, stage-1 candidate-set overlap, and final two-stage selection
Jaccard, on a realistic-scale synthetic pool with a briefly trained R50-FPN.

    python experiments/scoring_deviation.py [--steps 300] [--pool 512]
        [--budget 50] [--seeds 3]

Prints one JSON line per (seed, config) and a summary block; results recorded
in EXPERIMENTS.md.
"""

from __future__ import annotations

import argparse
import json
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

from cald_tpu.engine.optim import make_sgd
from cald_tpu.engine.state import create_train_state
from cald_tpu.engine.train import make_train_step
from cald_tpu.models import (
    fasterrcnn_resnet50_fpn_feature, retinanet_resnet50_fpn_cal,
)
from cald_tpu.strategies import CALDConfig, make_cald_score_fn
from cald_tpu.strategies.cald import cald_select

CANVAS = (640, 1024)
VALID = (600, 1000)
NUM_CLASSES = 21
MODEL_NAME = "faster"           # set from --model in main()


def build_scoring_detector(rpn_pre: int, rpn_post: int):
    """Detector for one scoring config. For RetinaNet the trim analog is the
    per-level ``topk_candidates`` (cli/driver.py _scoring_model,
    /root/reference/detection/retinanet_cal.py:331-333); rpn_pre is unused."""
    if MODEL_NAME == "retina":
        kw = {"topk_candidates": rpn_post} if rpn_post else {}
        return retinanet_resnet50_fpn_cal(NUM_CLASSES, norm="group", **kw)
    kw = {}
    if rpn_pre:
        kw["rpn_pre_nms_top_n_test"] = rpn_pre
    if rpn_post:
        kw["rpn_post_nms_top_n_test"] = rpn_post
    return fasterrcnn_resnet50_fpn_feature(NUM_CLASSES, norm="group", **kw)
MAX_BOXES = 8

# class-coded base colors (20 fg classes), textured so features are non-flat
_PALETTE = np.stack([
    np.array([(37 * (i + 3)) % 200 + 30,
              (91 * (i + 7)) % 200 + 30,
              (53 * (i + 11)) % 200 + 30], np.float32)
    for i in range(NUM_CLASSES - 1)
])


def make_scene(rng: np.random.Generator):
    """One (600, 1000) scene: textured background + 1..6 textured objects
    (rectangles/ellipses, sizes 60..380 px, aspects 0.4..2.5, may overlap)."""
    h, w = VALID
    base = rng.uniform(60, 180, (3,)).astype(np.float32)
    img = np.broadcast_to(base, (h, w, 3)).copy()
    # low-frequency background texture
    low = rng.normal(0, 18, (h // 50 + 2, w // 50 + 2, 3)).astype(np.float32)
    ys = np.linspace(0, low.shape[0] - 1.001, h)
    xs = np.linspace(0, low.shape[1] - 1.001, w)
    yi, xi = ys.astype(int), xs.astype(int)
    img += low[yi][:, xi]
    img += rng.normal(0, 6, (h, w, 3))

    boxes, labels = [], []
    for _ in range(int(rng.integers(1, 7))):
        c = int(rng.integers(1, NUM_CLASSES))
        area = rng.uniform(60, 380) ** 2
        aspect = rng.uniform(0.4, 2.5)
        bh = int(np.clip(np.sqrt(area * aspect), 24, h - 2))
        bw = int(np.clip(np.sqrt(area / aspect), 24, w - 2))
        y1 = int(rng.integers(0, h - bh))
        x1 = int(rng.integers(0, w - bw))
        patch = _PALETTE[c - 1] + rng.normal(0, 14, (bh, bw, 3))
        # radial soft edge so boxes are learnable but not trivial
        yy = np.linspace(-1, 1, bh)[:, None]
        xx = np.linspace(-1, 1, bw)[None, :]
        if rng.random() < 0.5:          # ellipse
            mask = (yy ** 2 + xx ** 2) <= 1.0
        else:                           # rectangle with jittered border
            mask = (np.abs(yy) <= 0.98) & (np.abs(xx) <= 0.98)
        region = img[y1:y1 + bh, x1:x1 + bw]
        region[mask] = patch[mask]
        boxes.append([x1, y1, x1 + bw, y1 + bh])
        labels.append(c)
    return (np.clip(img, 0, 255).astype(np.float32),
            np.asarray(boxes, np.float32), np.asarray(labels, np.int32))


def batch_scenes(rng, n):
    """n scenes pasted onto the canvas; returns device-ready arrays."""
    imgs = np.zeros((n, *CANVAS, 3), np.float32)
    boxes = np.zeros((n, MAX_BOXES, 4), np.float32)
    labels = np.zeros((n, MAX_BOXES), np.int32)
    valid = np.zeros((n, MAX_BOXES), bool)
    for i in range(n):
        im, bx, lb = make_scene(rng)
        imgs[i, :VALID[0], :VALID[1]] = im
        k = min(len(bx), MAX_BOXES)
        boxes[i, :k] = bx[:k]
        labels[i, :k] = lb[:k]
        valid[i, :k] = True
    hw = np.tile(np.asarray(VALID, np.int32), (n, 1))
    return imgs, hw, boxes, labels, valid


def train_model(seed: int, steps: int, batch: int = 4, bank_size: int = 96):
    """Train R50-FPN on a pre-generated scene bank (scene synthesis is
    host-bound on this 1-core box — pay it once, sample batches from it).

    GroupNorm backbone: there are no pretrained weights in this environment,
    and a random-init ResNet-50 with identity FrozenBN diverges (the reference
    always starts from pretrained BN stats). The RPN-count deviation under
    study is norm-agnostic."""
    from cald_tpu.engine.schedules import multistep_with_warmup

    model = build_scoring_detector(0, 0)
    rng = np.random.default_rng(seed)
    t0 = time.time()
    bank = batch_scenes(rng, bank_size)
    print(f"  scene bank ({bank_size}) in {time.time() - t0:.0f}s", flush=True)
    sched = multistep_with_warmup(0.0025, steps, milestones=(), gamma=1.0,
                                  warmup_iters=min(200, steps // 2))
    state = create_train_state(
        model, (jnp.asarray(bank[0][:2]), jnp.asarray(bank[1][:2])),
        lambda p: make_sgd(sched, momentum=0.9, weight_decay=1e-4, params=p),
        seed=seed)
    step_fn = make_train_step(model)
    t0 = time.time()
    for s in range(steps):
        idx = rng.choice(bank_size, batch, replace=False)
        state, metrics = step_fn(state, *(jnp.asarray(a[idx]) for a in bank),
                                 jax.random.fold_in(jax.random.key(seed), s))
        if s % 100 == 0 or s == steps - 1:
            m = {k: float(v) for k, v in metrics.items()}
            assert np.isfinite(m["loss"]), m
            print(f"  step {s}: loss {m['loss']:.3f}", flush=True)
    print(f"  trained {steps} steps in {time.time() - t0:.0f}s", flush=True)
    return state.variables


def score_pool(variables, pool_imgs, pool_hw, *, rpn_pre, rpn_post,
               shrink: bool, score_batch: int, key, alt_key: bool = False,
               flm: bool | None = None):
    if alt_key:                 # self-noise config: same path, new aug draws
        key = jax.random.fold_in(key, 9999)
    if flm is not None:         # full-level-matmul RoI kernel (round 5)
        os.environ["CALD_TPU_ROI_FLM"] = "1" if flm else "0"
    model = build_scoring_detector(rpn_pre, rpn_post)
    fn = make_cald_score_fn(model, CALDConfig(shrink_slice=shrink), NUM_CLASSES)
    cs, corrs = [], []
    for i in range(0, len(pool_imgs), score_batch):
        c, corr = fn(variables, jnp.asarray(pool_imgs[i:i + score_batch]),
                     jnp.asarray(pool_hw[i:i + score_batch]),
                     jax.random.fold_in(key, i))
        cs.append(np.asarray(c))
        corrs.append(np.asarray(corr))
    out = np.concatenate(cs), np.concatenate(corrs, axis=0)
    # each config builds + compiles a fresh scoring program; without this the
    # host leaks ~6 GB/config and a 4-seed x 7-config sweep OOM-kills at
    # ~122 GB RSS (observed round 5)
    del fn, model
    jax.clear_caches()
    import gc

    gc.collect()
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=300)
    ap.add_argument("--pool", type=int, default=512)
    ap.add_argument("--budget", type=int, default=50)
    ap.add_argument("--seeds", type=int, default=3)
    ap.add_argument("--seed-start", type=int, default=0,
                    help="first seed (resume a partial sweep)")
    ap.add_argument("--score-batch", type=int, default=32)
    ap.add_argument("--model", default="faster", choices=["faster", "retina"])
    args = ap.parse_args()
    global MODEL_NAME
    MODEL_NAME = args.model
    if args.model == "retina" and os.environ.get("DEVIATION_CONFIGS"):
        # the mild/mild640 sweeps are Faster-R-CNN-only; the retina branch
        # below would silently shadow them (ADVICE r4)
        raise SystemExit("DEVIATION_CONFIGS only applies to --model faster; "
                         "--model retina always runs the retina topk sweep")

    from scipy.stats import spearmanr

    cfg = CALDConfig()
    n_cand = int(cfg.mutual_range * args.budget)
    configs = {
        "faithful": dict(rpn_pre=0, rpn_post=0, shrink=False),
        "faithful+slice": dict(rpn_pre=0, rpn_post=0, shrink=True),
        "fast(400/256)": dict(rpn_pre=400, rpn_post=256, shrink=False),
        "fast+slice": dict(rpn_pre=400, rpn_post=256, shrink=True),
        "fast(400/128)": dict(rpn_pre=400, rpn_post=128, shrink=True),
    }
    if args.model == "retina":
        # the retina trim analog (driver --score-rpn-post-nms -> per-level
        # topk_candidates) with the same self-noise floor protocol as the
        # round-4 "mild" sweep below; rpn_pre is meaningless for retina
        configs = {
            "faithful": dict(rpn_pre=0, rpn_post=0, shrink=False),
            "faithful(keyB)": dict(rpn_pre=0, rpn_post=0, shrink=False,
                                   alt_key=True),
            "topk768": dict(rpn_pre=0, rpn_post=768, shrink=False),
            "topk512": dict(rpn_pre=0, rpn_post=512, shrink=False),
        }
    elif os.environ.get("DEVIATION_CONFIGS") == "mild640":
        # round-4b: the untested trim between 768 (at the floor, adopted) and
        # 512 (just below, opt-in). 768 repeats on every seed as the direct
        # same-seed comparator + a reproducibility check of the round-4 rows.
        configs = {
            "faithful": dict(rpn_pre=0, rpn_post=0, shrink=False),
            "faithful(keyB)": dict(rpn_pre=0, rpn_post=0, shrink=False,
                                   alt_key=True),
            "mild(1000/768)": dict(rpn_pre=0, rpn_post=768, shrink=False),
            "mild(1000/640)": dict(rpn_pre=0, rpn_post=640, shrink=False),
        }
    elif os.environ.get("DEVIATION_CONFIGS") == "shrink":
        # round-5 (VERDICT r4 item 2): floor-gate the shrink-slice lever —
        # detect shrink-resize augs on a proportionally sliced canvas
        # (strategies/cald.py shrink_slice, ~35% fewer FLOPs on that one
        # forward). Stacked on the adopted post-768 default (its production
        # configuration) plus slice-only to isolate the effect.
        configs = {
            "faithful": dict(rpn_pre=0, rpn_post=0, shrink=False, flm=False),
            "faithful(keyB)": dict(rpn_pre=0, rpn_post=0, shrink=False,
                                   alt_key=True, flm=False),
            "faithful+slice": dict(rpn_pre=0, rpn_post=0, shrink=True,
                                   flm=False),
            "mild(1000/768)": dict(rpn_pre=0, rpn_post=768, shrink=False,
                                   flm=False),
            "768+slice": dict(rpn_pre=0, rpn_post=768, shrink=True, flm=False),
        }
    elif os.environ.get("DEVIATION_CONFIGS") == "r5":
        # round-5 combined gate (VERDICT r4 items 2+3 + flm adoption) — one
        # sweep, shared per-seed training: post-768 on >=4 seeds, the
        # shrink-slice lever, and the full-level-matmul RoI kernel, each
        # judged against the aug-re-roll self-noise floor, solo and stacked
        # on the adopted post-768 default.
        configs = {
            "faithful": dict(rpn_pre=0, rpn_post=0, shrink=False, flm=False),
            "faithful(keyB)": dict(rpn_pre=0, rpn_post=0, shrink=False,
                                   alt_key=True, flm=False),
            "mild(1000/768)": dict(rpn_pre=0, rpn_post=768, shrink=False,
                                   flm=False),
            "faithful+flm": dict(rpn_pre=0, rpn_post=0, shrink=False,
                                 flm=True),
            "768+flm": dict(rpn_pre=0, rpn_post=768, shrink=False, flm=True),
            "faithful+slice": dict(rpn_pre=0, rpn_post=0, shrink=True,
                                   flm=False),
            "768+slice": dict(rpn_pre=0, rpn_post=768, shrink=True, flm=False),
        }
    elif os.environ.get("DEVIATION_CONFIGS") == "flm":
        # round-5: selection fidelity of the full-level-matmul RoI kernel —
        # bit-different matmul order vs the window kernel flips borderline
        # NMS survivors (measured: scores to 1e-4, a flipped box jumps), so
        # gate it like any numerics-shifting lever: against the aug-re-roll
        # self-noise floor, solo and stacked on the post-768 default.
        configs = {
            "faithful": dict(rpn_pre=0, rpn_post=0, shrink=False, flm=False),
            "faithful(keyB)": dict(rpn_pre=0, rpn_post=0, shrink=False,
                                   alt_key=True, flm=False),
            "faithful+flm": dict(rpn_pre=0, rpn_post=0, shrink=False,
                                 flm=True),
            "768+flm": dict(rpn_pre=0, rpn_post=768, shrink=False, flm=True),
        }
    elif os.environ.get("DEVIATION_CONFIGS") == "mild":
        # round-4 milder-trim sweep (BASELINE.md reconciliation 4a), with a
        # SELF-NOISE floor: the reference's own selection depends on the
        # random aug draws (cald_train.py scores with fresh augs), so
        # "faithful, different aug key" calibrates how much Jaccard a
        # BIT-IDENTICAL scoring path loses to re-rolling augs. A trim whose
        # Jaccard matches the self-noise floor is indistinguishable from an
        # aug re-roll; the adoption gate is relative to that floor, not to 1.
        configs = {
            "faithful": dict(rpn_pre=0, rpn_post=0, shrink=False),
            "faithful(keyB)": dict(rpn_pre=0, rpn_post=0, shrink=False,
                                   alt_key=True),
            "mild(1000/768)": dict(rpn_pre=0, rpn_post=768, shrink=False),
            "mild(1000/512)": dict(rpn_pre=0, rpn_post=512, shrink=False),
            "mild(600/384)": dict(rpn_pre=600, rpn_post=384, shrink=False),
        }
    summary = {k: [] for k in configs if k != "faithful"}
    for seed in range(args.seed_start, args.seeds):
        print(f"== seed {seed} ==", flush=True)
        variables = train_model(seed, args.steps)
        rng = np.random.default_rng(1000 + seed)
        pool_imgs, pool_hw, *_ = batch_scenes(rng, args.pool)
        # labeled set for the stage-2 class histogram
        _, _, lb_boxes, lb_labels, lb_valid = batch_scenes(rng, 100)
        counts = np.zeros((100, NUM_CLASSES - 1))
        for i in range(100):
            for l in lb_labels[i][lb_valid[i]]:
                counts[i, l - 1] += 1
        labeled_mean = counts.mean(axis=0)

        key = jax.random.key(7000 + seed)      # same aug draws for all configs
        results = {}
        for name, ckw in configs.items():
            t0 = time.time()
            c, corr = score_pool(variables, pool_imgs, pool_hw,
                                 score_batch=args.score_batch, key=key, **ckw)
            sel = cald_select(c, corr, labeled_mean, args.budget, cfg)
            cand = np.argsort(c, kind="stable")[:n_cand]
            results[name] = (c, corr, set(sel.tolist()), set(cand.tolist()))
            print(f"  {name}: scored {args.pool} in {time.time()-t0:.0f}s  "
                  f"mean c={c.mean():.4f} std={c.std():.4f} "
                  f"zero-score frac={float(np.mean(c == 0)):.2f}", flush=True)

        base_c, _, base_sel, base_cand = results["faithful"]
        for name in summary:
            c, _, sel, cand = results[name]
            rec = {
                "seed": seed, "config": name,
                "mean_abs_dc": float(np.mean(np.abs(c - base_c))),
                "max_abs_dc": float(np.max(np.abs(c - base_c))),
                "spearman": float(spearmanr(c, base_c).statistic),
                "stage1_overlap": len(cand & base_cand) / n_cand,
                "selection_jaccard": len(sel & base_sel) / len(sel | base_sel),
            }
            summary[name].append(rec)
            print(json.dumps(rec), flush=True)

    print("== summary (mean over seeds) ==")
    for name, recs in summary.items():
        agg = {k: round(float(np.mean([r[k] for r in recs])), 4)
               for k in recs[0] if k not in ("seed", "config")}
        print(json.dumps({"config": name, **agg}))


if __name__ == "__main__":
    main()
