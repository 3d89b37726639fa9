"""Selection-effectiveness experiment: CALD vs random on an imbalanced pool.

The framework's point is that CALD SELECTS BETTER than random. Real VOC/COCO
data is not available in this environment, so this uses the learnable
synthetic set with a skewed class distribution (bird appears in ~10% of pool
images) and a balanced test set: if CALD's consistency + class-balance
selection works, the rare class's AP50 should climb faster than under random
selection at the same label budget.

Run (TPU or CPU):
    python experiments/selection_effectiveness.py [seed ...]

Results are printed per cycle and summarized; see EXPERIMENTS.md for a
recorded run.
"""

import sys

import numpy as np

from cald_tpu.cli.config import ALConfig
from cald_tpu.cli.driver import al_loop
from cald_tpu.data import get_voc2007
from cald_tpu.data.synthetic import make_learnable_voc


def run(strategy: str, seed: int, tmp: str):
    train_root = make_learnable_voc(
        f"{tmp}/train_{seed}", num_images=60, seed=100 + seed,
        class_probs=(0.55, 0.35, 0.10))
    test_root = make_learnable_voc(
        f"{tmp}/test_{seed}", num_images=36, seed=900 + seed,
        class_probs=(1 / 3, 1 / 3, 1 / 3))
    train_ds = get_voc2007(train_root, "trainval")
    test_ds = get_voc2007(test_root, "test")
    cfg = ALConfig(
        dataset="voc2007", data_path=train_root, model="faster",
        strategy=strategy, tiny=True, norm="group", cycles=4, epochs=16,
        batch_size=4, init_num=12, budget_num=6, score_batch_size=8, workers=4,
        min_size=96, max_size=128, max_boxes=8, print_freq=100000, lr=0.005,
        lr_steps=(12, 14), aspect_ratio_group_factor=0, seed=seed).resolve()
    hist = al_loop(cfg, datasets=(train_ds, test_ds))
    rows = []
    for h in hist:
        ev = h["eval"]
        rows.append((h["labeled"], float(ev.get("mAP", 0.0)),
                     float(ev.get("per_class_ap50", {}).get("bird", 0.0))))
    return rows


def main():
    import tempfile

    seeds = [int(a) for a in sys.argv[1:]] or [0, 1]
    out = {}
    with tempfile.TemporaryDirectory() as tmp:
        for strategy in ("cald", "random"):
            per_seed = [run(strategy, s, tmp) for s in seeds]
            out[strategy] = per_seed
            for s, rows in zip(seeds, per_seed):
                print(f"{strategy} seed {s}: " + " | ".join(
                    f"n={n} mAP={m:.3f} birdAP50={b:.3f}" for n, m, b in rows))
    for strategy, per_seed in out.items():
        final_bird = np.mean([rows[-1][2] for rows in per_seed])
        final_map = np.mean([rows[-1][1] for rows in per_seed])
        print(f"== {strategy}: final mAP {final_map:.3f}, "
              f"final bird AP50 {final_bird:.3f} (mean over {len(per_seed)} seeds)")


if __name__ == "__main__":
    main()
