"""Worker for the 2-process distributed test (run by test_parallel.py).

Each process: initialize_distributed -> full AL cycle on a shared synthetic
VOC tree (global-mesh DP training, process-sharded eval + pool scoring with
host-side merges) -> dump the per-cycle history to ``outfile``. The test
asserts both processes produced IDENTICAL histories (selection and eval are
deterministic and replicated by construction).

Covers the multi-host analog of /root/reference/detection/utils.py:75-115
(all_gather of predictions) and :302-324 (init_distributed_mode).
"""

import json
import sys


def main():
    pid, port, voc_root, outfile = (int(sys.argv[1]), sys.argv[2], sys.argv[3],
                                    sys.argv[4])
    strategy = sys.argv[5] if len(sys.argv) > 5 else "cald"
    from cald_tpu.parallel import initialize_distributed

    assert initialize_distributed(coordinator=f"localhost:{port}",
                                  num_processes=2, process_id=pid)
    import jax

    assert jax.process_count() == 2, jax.process_count()

    from cald_tpu.cli.config import ALConfig
    from cald_tpu.cli.driver import al_loop
    from cald_tpu.data import get_voc2007

    cfg = ALConfig(
        dataset="voc2007", data_path=voc_root, model="faster", strategy=strategy,
        tiny=True, norm="group", cycles=2, epochs=1, batch_size=2,
        init_num=4, budget_num=3, score_batch_size=2, workers=0,
        min_size=96, max_size=128, max_boxes=8, print_freq=100,
        aspect_ratio_group_factor=0, eval_every_cycle=True).resolve()
    ds = get_voc2007(voc_root, "trainval")
    history = al_loop(cfg, datasets=(ds, ds))
    payload = [{"cycle": h["cycle"], "labeled": h["labeled"],
                "mAP": round(float(h["eval"].get("mAP", -1.0)), 6)}
               for h in history]
    with open(outfile, "w") as f:
        json.dump(payload, f)
    print(f"proc {pid}: {payload}")


if __name__ == "__main__":
    main()
