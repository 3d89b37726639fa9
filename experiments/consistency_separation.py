"""Does CALD consistency scoring FIND hard images? (mechanism isolation)

The full AL-curve experiment (selection_effectiveness_hard.py) spends most of
its compute training detectors across cycles; on an undertrained detector the
consistency signal is noise (measured: 6-epoch smoke, mAP 0.02, CALD
hard-selection rate == pool base rate). This experiment isolates the claim the
reference's method stands on (README.md:1-16, cald_train.py:91-231): a
reasonably-trained detector's augmentation-consistency score separates
hard-to-detect images from easy ones.

Per seed:
  1. hard/easy pool (make_hard_easy_voc, 30% hard) + a held-out test set;
  2. train the detector ONCE, well (epochs >> the AL-loop smoke), on a random
     init set (hard_frac == base rate);
  3. CALD-score every unlabeled pool image (reference-faithful path);
  4. report
       * AUC of (-consistency) ranking hard above easy  (0.5 = blind),
       * mean consistency for hard vs easy pool images (effect size),
       * hard fraction of the budget-50 two-stage CALD selection vs the
         pool base rate and vs the random-draw std,
       * test mAP/AP50 at scoring time (detector-quality context).

    PYTHONPATH=/root/repo python experiments/consistency_separation.py \
        [--seeds 3] [--pool 400] [--init 120] [--epochs 16]
"""

from __future__ import annotations

import argparse
import json
import tempfile

import jax
import numpy as np

from cald_tpu.cli.config import ALConfig
from cald_tpu.cli.driver import build_model, score_and_select, train_cycle
from cald_tpu.data import get_voc2007
from cald_tpu.data.batching import create_aspect_ratio_groups, default_canvases
from cald_tpu.data.pool import ALPoolState
from cald_tpu.data.synthetic import make_hard_easy_voc
from cald_tpu.engine import evaluate
from cald_tpu.strategies import CALDConfig, make_cald_score_fn, score_pool
from cald_tpu.augment.suite import expand_aug_string


def is_hard(dataset, idx: int) -> bool:
    return dataset.record(int(idx)).image_id.startswith("h")


def auc(pos_scores: np.ndarray, neg_scores: np.ndarray) -> float:
    """P(random pos ranks above random neg), ties 0.5 (Mann-Whitney)."""
    pos = np.asarray(pos_scores)[:, None]
    neg = np.asarray(neg_scores)[None, :]
    return float(((pos > neg).sum() + 0.5 * (pos == neg).sum())
                 / (pos.size * neg.size))


def run(seed: int, tmp: str, *, pool_n: int, init_n: int, epochs: int,
        budget: int) -> dict:
    train_root = make_hard_easy_voc(f"{tmp}/train_{seed}", num_images=pool_n,
                                    hard_frac=0.3, seed=100 + seed)
    test_root = make_hard_easy_voc(f"{tmp}/test_{seed}", num_images=120,
                                   hard_frac=0.5, seed=900 + seed)
    train_ds = get_voc2007(train_root, "trainval")
    test_ds = get_voc2007(test_root, "test")
    num_classes = len(train_ds.class_names)

    cfg = ALConfig(
        dataset="voc2007", data_path=train_root, model="faster",
        strategy="cald", tiny=True, norm="group", cycles=1, epochs=epochs,
        batch_size=8, init_num=init_n, budget_num=budget,
        score_batch_size=16, workers=4, min_size=192, max_size=256,
        max_boxes=8, print_freq=100000, lr=0.005,
        lr_steps=(max(epochs - 4, 1), max(epochs - 2, 2)),
        aspect_ratio_group_factor=0, seed=seed).resolve()

    canvases = default_canvases(cfg.min_size, cfg.max_size)
    group_ids = create_aspect_ratio_groups(train_ds.aspect_ratios(),
                                           cfg.aspect_ratio_group_factor)
    test_group_ids = create_aspect_ratio_groups(test_ds.aspect_ratios(),
                                                cfg.aspect_ratio_group_factor)
    model, frozen = build_model(cfg, num_classes)
    pool = ALPoolState.initial(len(train_ds), cfg.init_num, cfg.seed)

    state = train_cycle(cfg, model, frozen, train_ds, pool, canvases,
                        group_ids, cycle=0)

    from cald_tpu.cli.driver import _loaders, _mesh_hooks, _scoring_model

    test_loader = _loaders(cfg, test_ds, range(len(test_ds)),
                           batch_size=cfg.score_batch_size, train=False,
                           canvases=canvases, group_ids=test_group_ids)
    ev = evaluate(model, state.variables, test_loader, test_ds, kind="voc")

    # raw consistency scores over the whole unlabeled pool (faithful path)

    ccfg = CALDConfig(aug_names=tuple(expand_aug_string(cfg.augs)),
                     base_point=cfg.bp, mutual_range=cfg.mr)
    score_fn = make_cald_score_fn(_scoring_model(cfg, model), ccfg,
                                  num_classes)
    subset = pool.unlabeled.copy()
    loader = _loaders(cfg, train_ds, subset, batch_size=cfg.score_batch_size,
                      train=False, canvases=canvases, group_ids=group_ids)
    put_batch, _ = _mesh_hooks()
    key = jax.random.fold_in(jax.random.key(cfg.seed + 17), 0)
    consistency, corrs = score_pool(score_fn, state.variables, loader, key,
                                    subset, put=put_batch)
    consistency = np.asarray(consistency)

    hard_mask = np.asarray([is_hard(train_ds, i) for i in subset])
    # informative = LOW consistency (reference selects ascending)
    sep_auc = auc(-consistency[hard_mask], -consistency[~hard_mask])

    # the actual two-stage selection (identical code path to the driver)
    picked = score_and_select(cfg, model, state, train_ds, pool, canvases,
                              group_ids, cycle=0, strategy_state={})
    sel_hard = float(np.mean([is_hard(train_ds, i) for i in picked]))

    base = float(hard_mask.mean())
    n_u = len(subset)
    rand_std = float(np.sqrt(base * (1 - base) / budget
                             * (n_u - budget) / (n_u - 1)))
    return {
        "seed": seed,
        "test_mAP": round(float(ev.get("mAP", 0.0)), 4),
        "test_AP50": round(float(ev.get("AP50", 0.0)), 4),
        "auc_hard_vs_easy": round(sep_auc, 4),
        "mean_consistency_hard": round(float(consistency[hard_mask].mean()), 4),
        "mean_consistency_easy": round(float(consistency[~hard_mask].mean()), 4),
        "sel_hard_frac": round(sel_hard, 4),
        "pool_hard_frac": round(base, 4),
        "rand_sel_std": round(rand_std, 4),
        "enrichment_sigma": round((sel_hard - base) / rand_std, 2),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--seeds", type=int, default=3)
    ap.add_argument("--seed-start", type=int, default=0,
                    help="first seed (resume an interrupted sweep)")
    ap.add_argument("--pool", type=int, default=400)
    ap.add_argument("--init", type=int, default=120)
    ap.add_argument("--epochs", type=int, default=16)
    ap.add_argument("--budget", type=int, default=50)
    args = ap.parse_args()

    rows = []
    with tempfile.TemporaryDirectory() as tmp:
        for seed in range(args.seed_start, args.seeds):
            row = run(seed, tmp, pool_n=args.pool, init_n=args.init,
                      epochs=args.epochs, budget=args.budget)
            rows.append(row)
            print(json.dumps(row), flush=True)

    keys = [k for k in rows[0] if k != "seed"]
    print(json.dumps({"mean": {k: round(float(np.mean([r[k] for r in rows])), 4)
                               for k in keys}}))


if __name__ == "__main__":
    main()
