"""Plain supervised trainer (the reference's detection/train.py, non-AL L5
entry): train on the FULL training split with checkpoint/resume support.

    python -m cald_tpu.cli.train --dataset voc2007 --data-path ... \
        --model faster --epochs 26 --output-dir /ckpts [--resume /ckpts/last]

Data parallelism is automatic when multiple devices are visible: batches shard
over the mesh, params replicate (replaces the reference's DDP wrap +
DistributedSampler, detection/train.py:75-77,104-106).
"""

from __future__ import annotations

import os
import sys

import jax
import jax.numpy as jnp
import numpy as np

from cald_tpu.cli.config import ALConfig, make_parser
from cald_tpu.cli.driver import _fresh_state, _loaders, build_datasets, build_model
from cald_tpu.data import ALPoolState, create_aspect_ratio_groups, default_canvases
from cald_tpu.engine import (
    evaluate, load_checkpoint, make_train_step, save_checkpoint, train_one_epoch,
)
from cald_tpu.parallel import data_mesh, replicate, shard_batch


def main(argv=None):
    from cald_tpu.parallel import initialize_distributed

    initialize_distributed()  # env-gated; single-process no-op
    parser = make_parser()
    parser.add_argument("--resume", default="")
    args = parser.parse_args(argv)
    import dataclasses

    fields = {f.name for f in dataclasses.fields(ALConfig)}
    cfg = ALConfig(**{k: v for k, v in vars(args).items() if k in fields})
    cfg = dataclasses.replace(cfg, lr_steps=tuple(cfg.lr_steps)).resolve()
    print(cfg)

    train_ds, test_ds = build_datasets(cfg)
    num_classes = len(train_ds.class_names)
    canvases = default_canvases(cfg.min_size, cfg.max_size)
    group_ids = create_aspect_ratio_groups(train_ds.aspect_ratios(),
                                           cfg.aspect_ratio_group_factor)
    test_group_ids = create_aspect_ratio_groups(test_ds.aspect_ratios(),
                                                cfg.aspect_ratio_group_factor)
    model, frozen_prefixes = build_model(cfg, num_classes)

    # "pool" covering everything = plain supervised training
    pool = ALPoolState(labeled=np.arange(len(train_ds)),
                       unlabeled=np.zeros((0,), np.int64))
    state = _fresh_state(cfg, model, frozen_prefixes, train_ds, pool, canvases,
                         group_ids, cycle=0)

    start_epoch = 0
    if args.resume:
        state, _, _, meta = load_checkpoint(args.resume, state)
        start_epoch = int(meta.get("epoch", -1)) + 1
        print(f"resumed from {args.resume} at epoch {start_epoch}")

    if jax.process_count() > 1:
        from cald_tpu.cli.driver import _lockstep, _mesh_hooks

        put, put_state = _mesh_hooks(train=True)
        state = put_state(state)
        lockstep = _lockstep
        print(f"multi-process data-parallel: {jax.process_count()} processes, "
              f"{jax.device_count()} devices")
    elif jax.device_count() > 1:
        mesh = data_mesh()
        state = jax.tree.map(
            lambda x: replicate(x, mesh) if hasattr(x, "shape") else x, state)
        put = lambda b: shard_batch(b, mesh)
        lockstep = iter
        print(f"data-parallel over {jax.device_count()} devices")
    else:
        put = lambda b: b
        lockstep = iter

    step_fn = make_train_step(model)
    for epoch in range(start_epoch, cfg.epochs):
        loader = _loaders(cfg, train_ds, pool.labeled, batch_size=cfg.batch_size,
                          train=True, canvases=canvases, group_ids=group_ids,
                          seed=cfg.seed + epoch)
        batches = (put(b) for b in lockstep(loader))
        state, _ = train_one_epoch(state, step_fn, batches,
                                   jax.random.key(cfg.seed), epoch=epoch,
                                   print_freq=cfg.print_freq)
        if cfg.output_dir and jax.process_index() == 0:
            from cald_tpu.parallel import to_host_local

            save_checkpoint(os.path.join(cfg.output_dir, "last"),
                            to_host_local(state) if jax.process_count() > 1
                            else state,
                            meta={"epoch": epoch})
    if cfg.eval_every_cycle:
        if jax.process_count() > 1:
            from cald_tpu.parallel import process_shard, to_host_local

            state = to_host_local(state)
            test_indices = process_shard(range(len(test_ds)), pad=False)
        else:
            test_indices = range(len(test_ds))
        test_loader = _loaders(cfg, test_ds, test_indices,
                               batch_size=cfg.score_batch_size, train=False,
                               canvases=canvases, group_ids=test_group_ids)
        evaluate(model, state.variables, test_loader, test_ds, kind=cfg.eval_kind)
    return state


if __name__ == "__main__":
    main(sys.argv[1:])
