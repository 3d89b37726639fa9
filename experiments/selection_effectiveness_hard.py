"""Selection effectiveness, round 3: CALD vs random on a hard/easy pool.

Round 2's experiment (selection_effectiveness.py) showed the mechanism could
not win on solid same-size rectangles: augmentation instability was
uncorrelated with informativeness and budget 6 gave stage 2 no room. This
regime is built so consistency has something real to find (VERDICT r2 #7):

  * pool images are 30% HARD — border truncation, occluder bars, small scale,
    crowding, class-colored distractors (make_hard_easy_voc) — conditions
    under which detections are unstable under the CALD augmentations;
  * the test set is 50% hard, so a detector trained mostly on easy images
    generalizes poorly and labeling hard images is what moves mAP;
  * budget 50 over a 400-image pool: stage 1 keeps 60 candidates and stage 2
    has room to act.

Reports per-cycle mAP and the HARD FRACTION of each strategy's selections
(read back from the per-cycle checkpoints' pools) — the enrichment statistic
is the direct mechanism check, mAP the end-to-end one.

    python experiments/selection_effectiveness_hard.py [--seeds 3] [--cycles 3]
"""

from __future__ import annotations

import argparse
import json
import os
import tempfile

import numpy as np

from cald_tpu.cli.config import ALConfig
from cald_tpu.cli.driver import al_loop
from cald_tpu.data import get_voc2007
from cald_tpu.data.synthetic import make_hard_easy_voc


def hard_fraction(dataset, indices) -> float:
    ids = [dataset.record(int(i)).image_id for i in indices]
    return sum(1 for s in ids if s.startswith("h")) / max(len(ids), 1)


def run(strategy: str, seed: int, tmp: str, *, cycles: int, pool_n: int,
        epochs: int, init_n: int = 50):
    train_root = make_hard_easy_voc(
        f"{tmp}/train_{seed}", num_images=pool_n, hard_frac=0.3,
        seed=100 + seed)
    test_root = make_hard_easy_voc(
        f"{tmp}/test_{seed}", num_images=120, hard_frac=0.5, seed=900 + seed)
    train_ds = get_voc2007(train_root, "trainval")
    test_ds = get_voc2007(test_root, "test")
    out_dir = f"{tmp}/ckpt_{strategy}_{seed}"
    cfg = ALConfig(
        dataset="voc2007", data_path=train_root, model="faster",
        strategy=strategy, tiny=True, norm="group", cycles=cycles,
        epochs=epochs, batch_size=8, init_num=init_n, budget_num=50,
        score_batch_size=16, workers=4, min_size=192, max_size=256,
        max_boxes=8, print_freq=100000, lr=0.005,
        lr_steps=(epochs - 4, epochs - 2), aspect_ratio_group_factor=0,
        seed=seed, output_dir=out_dir).resolve()
    hist = al_loop(cfg, datasets=(train_ds, test_ds))

    from cald_tpu.engine.checkpoint import peek_checkpoint

    rows = []
    prev_labeled = None
    for h in hist:
        pool, _, _ = peek_checkpoint(os.path.join(out_dir, f"cycle_{h['cycle']}"))
        labeled = set(int(i) for i in pool.labeled)
        newly = labeled - prev_labeled if prev_labeled is not None else labeled
        prev_labeled = labeled
        rows.append({
            "cycle": h["cycle"], "labeled": h["labeled"],
            "mAP": round(float(h["eval"].get("mAP", 0.0)), 4),
            "AP50": round(float(h["eval"].get("AP50", 0.0)), 4),
            "hard_frac_selected": round(hard_fraction(train_ds, newly), 3),
        })
    return rows


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--seeds", type=int, default=3)
    ap.add_argument("--seed-start", type=int, default=0,
                    help="resume a sweep: run seeds [seed-start, seeds)")
    ap.add_argument("--cycles", type=int, default=3)
    ap.add_argument("--pool", type=int, default=400)
    ap.add_argument("--epochs", type=int, default=14)
    ap.add_argument("--init", type=int, default=50,
                    help="init labeled set (120 + --epochs 16 reproduces the "
                         "mechanism-isolation operating point)")
    ap.add_argument("--strategies", default="cald,random",
                    help="comma list; round-5 evidence run adds ll4al")
    args = ap.parse_args()

    summary = {}
    with tempfile.TemporaryDirectory() as tmp:
        for strategy in args.strategies.split(","):
            per_seed = []
            for seed in range(args.seed_start, args.seeds):
                rows = run(strategy, seed, tmp, cycles=args.cycles,
                           pool_n=args.pool, epochs=args.epochs,
                           init_n=args.init)
                per_seed.append(rows)
                # each run() builds fresh jitted programs; without this a
                # 3-strategy x 5-seed sweep leaks to a host OOM kill
                # (observed in the round-5 deviation sweep at 122 GB RSS)
                import gc

                import jax

                jax.clear_caches()
                gc.collect()
                print(json.dumps({"strategy": strategy, "seed": seed,
                                  "rows": rows}), flush=True)
            summary[strategy] = per_seed

    print("== summary (mean over seeds) ==")
    for strategy, per_seed in summary.items():
        for c in range(len(per_seed[0])):
            m = np.mean([rows[c]["mAP"] for rows in per_seed])
            a = np.mean([rows[c]["AP50"] for rows in per_seed])
            hf = np.mean([rows[c]["hard_frac_selected"] for rows in per_seed])
            print(json.dumps({"strategy": strategy, "cycle": c,
                              "mean_mAP": round(float(m), 4),
                              "mean_AP50": round(float(a), 4),
                              "mean_hard_frac_selected": round(float(hf), 3)}))

    # seed-level CALD-vs-baseline statistics (VERDICT r4 item 5): per-seed
    # mAP deltas at each cycle, mean +- a t-based 90% CI, and the exact
    # binomial sign test over seed-level wins at the final cycle.
    base_seeds = list(range(args.seed_start, args.seeds))
    for baseline in summary:
        if baseline == "cald" or "cald" not in summary:
            continue
        print(f"== cald vs {baseline} ==")
        for c in range(args.cycles):
            d = np.asarray([summary["cald"][i][c]["mAP"]
                            - summary[baseline][i][c]["mAP"]
                            for i in range(len(base_seeds))])
            n = len(d)
            mean = d.mean()
            ci = (1.833 if n == 10 else 2.132 if n == 5 else 2.0) * d.std(
                ddof=1) / np.sqrt(n) if n > 1 else float("nan")
            wins = int((d > 0).sum())
            # exact one-sided sign test P(X >= wins | p=0.5, ties dropped)
            eff = int((d != 0).sum())
            from math import comb
            p_sign = sum(comb(eff, k) for k in range(wins, eff + 1)) / 2 ** eff \
                if eff else 1.0
            print(json.dumps({
                "cycle": c, "delta_mAP_per_seed": [round(float(x), 4) for x in d],
                "mean_delta": round(float(mean), 4),
                "ci90_halfwidth": round(float(ci), 4),
                "wins": f"{wins}/{n}", "sign_test_p": round(p_sign, 4)}))


if __name__ == "__main__":
    main()
