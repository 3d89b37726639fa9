"""The active-learning cycle driver (re-design of cald_train.py:274-465 and the
six sibling drivers as one strategy-dispatched loop).

Cycle structure (identical to the reference):
    for cycle: train on labeled -> eval -> score pool -> select budget ->
               labeled += selection

All strategies share the training/eval path; scoring+selection dispatches on
``cfg.strategy``. AL state (pool split, cycle, rng) is checkpointed with the
model so any cycle boundary is resumable (the reference loses the split,
SURVEY.md §5).
"""

from __future__ import annotations

import os
import time
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np

from cald_tpu.cli.config import ALConfig
from cald_tpu.data import (
    ALPoolState, BatchLoader, default_canvases, create_aspect_ratio_groups,
    get_coco, get_voc2007, get_voc2012, grouped_batch_indices,
)
from cald_tpu.data.transforms import random_horizontal_flip
from cald_tpu.engine import (
    create_train_state, evaluate, load_checkpoint, load_extra, make_sgd,
    make_train_step, multistep_with_warmup, peek_checkpoint, save_checkpoint,
    train_one_epoch,
)
from cald_tpu.engine.evaluate import run_inference
from cald_tpu.engine.optim import RESNET_FROZEN_L3
from cald_tpu.models import (
    FasterRCNN, FasterRCNNConfig, LossNet, RetinaNet, RetinaNetConfig,
    fasterrcnn_mobilenetv3_fpn_feature, fasterrcnn_resnet50_fpn_feature,
    retinanet_mobilenet, retinanet_resnet50_fpn_cal,
)
from cald_tpu.strategies import (
    CALDConfig, SSMConfig, cald_select, labeled_class_counts,
    make_cald_score_fn, make_lsc_score_fn, make_ltc_score_fn, random_select,
    score_pool, ssm_select, VAALTrainer, vaal_select,
)
from cald_tpu.strategies.ll4al import (
    ll_scores, ll_select, make_ll_score_fn, make_ll_train_step,
)
from cald_tpu.strategies.lsc import lsc_scores
from cald_tpu.strategies.ltc import run_ltc
from cald_tpu.strategies.ssm import CrossValidator
from cald_tpu.augment import expand_aug_string


def build_datasets(cfg: ALConfig):
    if cfg.dataset == "voc2007":
        train = get_voc2007(cfg.data_path, "trainval")
        test = get_voc2007(cfg.data_path, "test")
    elif cfg.dataset == "voc2012":
        train = get_voc2012(cfg.data_path, "trainval")
        test = get_voc2012(cfg.data_path, "val")
    elif "coco" in cfg.dataset:
        train = get_coco(cfg.data_path, "train")
        test = get_coco(cfg.data_path, "val")
    else:
        raise ValueError(f"unknown dataset {cfg.dataset!r}")
    return train, test


def build_model(cfg: ALConfig, num_classes: int):
    """Returns (model, frozen param-path prefixes)."""
    kw: dict = dict(norm=cfg.norm)
    if cfg.tiny:
        kw.update(backbone="tiny",
                  rpn_pre_nms_top_n_train=128, rpn_pre_nms_top_n_test=128,
                  rpn_post_nms_top_n_train=64, rpn_post_nms_top_n_test=64,
                  rpn_batch_size_per_image=32, box_batch_size_per_image=32,
                  detections_per_img=16, representation_size=64)
    frozen = RESNET_FROZEN_L3 if (cfg.norm == "frozen" and not cfg.tiny) else ()
    if cfg.model == "faster":
        if cfg.tiny:
            return FasterRCNN(FasterRCNNConfig(num_classes=num_classes, **kw)), ()
        return fasterrcnn_resnet50_fpn_feature(num_classes, **kw), frozen
    if cfg.model == "faster_mobilenet":
        return fasterrcnn_mobilenetv3_fpn_feature(num_classes, norm=cfg.norm), ()
    if cfg.model == "retina":
        if cfg.tiny:
            return RetinaNet(RetinaNetConfig(
                num_classes=num_classes, backbone="tiny", norm=cfg.norm,
                detections_per_img=16, topk_candidates=64,
                anchor_sizes=((16, 20),) * 5)), ()
        return retinanet_resnet50_fpn_cal(num_classes, norm=cfg.norm), frozen
    if cfg.model == "retina_mobilenet":
        return retinanet_mobilenet(num_classes, norm=cfg.norm), ()
    raise ValueError(f"unknown model {cfg.model!r}")


def _loaders(cfg: ALConfig, dataset, indices, *, batch_size, train: bool,
             canvases, group_ids, seed=0, shard: bool | None = None):
    """``shard`` (default: ``train``): in multi-process mode, stride the index
    list by process — the DistributedSampler analog; per-process batches then
    combine into one global array per train step. Pass shard=False for loops
    that must stay replicated across processes (the host-side ll4al joint step
    and the VAAL adversary, whose models live outside the global mesh)."""
    if (train if shard is None else shard) and jax.process_count() > 1:
        from cald_tpu.parallel import process_shard

        indices = process_shard(indices)
    rng = np.random.default_rng(seed) if train else None
    batches = grouped_batch_indices(list(indices), group_ids, batch_size, rng)
    return BatchLoader(
        dataset, batches, canvases=canvases, min_size=cfg.min_size,
        max_size=cfg.max_size, max_boxes=cfg.max_boxes,
        transform=(lambda im, bx, r: random_horizontal_flip(im, bx, r))
        if train else None,
        num_workers=cfg.workers, seed=seed)


def _sync_len(n: int) -> int:
    """Globally-agreed per-epoch step count: the MIN of the per-process loader
    lengths, so collective train steps never deadlock on a straggler's extra
    batch. Identity single-process."""
    if jax.process_count() == 1:
        return n
    from cald_tpu.parallel import all_gather_objects

    return min(all_gather_objects(int(n)))


def _lockstep(loader):
    """Iterate a per-process train loader for exactly the agreed step count."""
    n = _sync_len(len(loader))
    import itertools

    yield from itertools.islice(iter(loader), n)


_PRETRAINED_SD_CACHE: dict[str, dict] = {}


def _apply_pretrained_backbone(state, cfg: ALConfig):
    """Swap the freshly-initialized backbone for converted torchvision ImageNet
    weights — the analog of pretrained_backbone=True in the reference
    constructors (frcnn_la.py:283, retinanet_cal.py:617,685). Runs every cycle
    because the reference rebuilds the model per cycle from pretrained weights;
    the host-side file read is cached across cycles."""
    if not cfg.pretrained_backbone:
        return state
    from cald_tpu.convert.torchvision_import import load_backbone_into_variables

    sd = _PRETRAINED_SD_CACHE.get(cfg.pretrained_backbone)
    if sd is None:
        from cald_tpu.convert.pth_reader import load_state_dict

        sd = load_state_dict(cfg.pretrained_backbone)
        _PRETRAINED_SD_CACHE[cfg.pretrained_backbone] = sd
    new = load_backbone_into_variables(
        {"params": state.params, "frozen": state.frozen}, sd)
    to_dev = lambda t: jax.tree.map(jnp.asarray, t)  # noqa: E731
    return state.replace(params=to_dev(new["params"]),
                         frozen=to_dev(new["frozen"]))


def _fresh_state(cfg: ALConfig, model, frozen_prefixes, dataset, pool,
                 canvases, group_ids, *, cycle: int):
    """Fresh model + optimizer for a cycle (the reference re-creates the model
    every cycle, cald_train.py:338-347)."""
    example = (jnp.zeros((cfg.batch_size, canvases[0].height, canvases[0].width, 3)),
               jnp.zeros((cfg.batch_size, 2), jnp.int32))
    loader0 = _loaders(cfg, dataset, pool.labeled, batch_size=cfg.batch_size,
                       train=True, canvases=canvases, group_ids=group_ids,
                       seed=cfg.seed + cycle)
    steps_per_epoch = max(_sync_len(len(loader0)), 1)
    sched = multistep_with_warmup(cfg.lr, steps_per_epoch,
                                  milestones=cfg.lr_steps, gamma=cfg.lr_gamma,
                                  warmup_iters=cfg.warmup_iters)
    state = create_train_state(
        model, example,
        lambda params: make_sgd(sched, momentum=cfg.momentum,
                                weight_decay=cfg.weight_decay, params=params,
                                frozen_prefixes=frozen_prefixes),
        seed=cfg.seed)
    return _apply_pretrained_backbone(state, cfg)


def _mesh_hooks(*, train: bool = False):
    """(put_batch, put_state): shard batches / replicate state over the data
    mesh when multiple devices are visible; identity on a single chip. This is
    the whole DDP story (SURVEY.md §2.7-2.8) — XLA adds the collectives.

    Multi-process (multi-host) topologies split by use:
      * train=True: one GLOBAL mesh; per-process loader shards assemble into a
        global batch (host_local_array_to_global_array) and the jitted step's
        loss mean runs the gradient all-reduce over ICI/DCN;
      * train=False (eval/pool scoring): a LOCAL mesh only — each process
        scores its own strided shard independently and results merge host-side
        (process_shard + process_merge_sum / all_gather_objects).
    """
    if jax.process_count() > 1:
        from cald_tpu.parallel import (
            data_mesh, global_batch, global_replicate, local_data_mesh,
            shard_batch,
        )

        if train:
            mesh = data_mesh()
            return (lambda b: global_batch(b, mesh)), (
                lambda s: global_replicate(s, mesh))
        mesh = local_data_mesh()
        return (lambda b: shard_batch(b, mesh)), (lambda s: s)
    if jax.device_count() <= 1:
        return (lambda b: b), (lambda s: s)
    from cald_tpu.parallel import data_mesh, replicate, shard_batch

    mesh = data_mesh()
    return (lambda b: shard_batch(b, mesh)), (
        lambda s: jax.tree.map(
            lambda x: replicate(x, mesh) if hasattr(x, "shape") else x, s))


def train_cycle(cfg: ALConfig, model, frozen_prefixes, dataset, pool,
                canvases, group_ids, *, cycle: int):
    """Fresh model + full training schedule on the current labeled set."""
    state = _fresh_state(cfg, model, frozen_prefixes, dataset, pool, canvases,
                         group_ids, cycle=cycle)
    put_batch, put_state = _mesh_hooks(train=True)
    state = put_state(state)
    step_fn = make_train_step(model)
    for epoch in range(cfg.epochs):
        loader = _loaders(cfg, dataset, pool.labeled, batch_size=cfg.batch_size,
                          train=True, canvases=canvases, group_ids=group_ids,
                          seed=cfg.seed + cycle * 1000 + epoch)
        state, _ = train_one_epoch(
            state, step_fn, (put_batch(b) for b in _lockstep(loader)),
            jax.random.fold_in(jax.random.key(cfg.seed), epoch),
            epoch=epoch, cycle=cycle, print_freq=cfg.print_freq)
    return state


def _detect_host_fn(cfg: ALConfig, model, variables, canvases):
    """fn(list of (H, W, 3) arrays) -> per-image dicts in original coords —
    the SSM cross-validator's re-detect hook."""
    from cald_tpu.data.batching import make_padded_batch
    from cald_tpu.data.records import ImageRecord

    detect = jax.jit(lambda v, im, hw: model.apply(v, im, hw, method="detect"))

    def run(images):
        out = []
        for img in images:
            rec = ImageRecord(image_id="cv", image_path="", width=img.shape[1],
                              height=img.shape[0], boxes=np.zeros((0, 4), np.float32),
                              labels=np.zeros((0,), np.int32),
                              difficult=np.zeros((0,), np.int32))
            batch = make_padded_batch([img], [rec], canvases[0],
                                      min_size=cfg.min_size, max_size=cfg.max_size,
                                      max_boxes=1, indices=[0])
            dets = detect(variables, jnp.asarray(batch.images),
                          jnp.asarray(batch.valid_hw))
            dets = dets.rescale(jnp.asarray(batch.scale))
            v = np.asarray(dets.valid[0])
            out.append({"boxes": np.asarray(dets.boxes[0])[v],
                        "scores": np.asarray(dets.scores[0])[v],
                        "labels": np.asarray(dets.labels[0])[v]})
        return out

    return run


def _scoring_model(cfg: ALConfig, model):
    """Scoring-pass variant with smaller candidate counts (capped at the
    model's own, so tiny/test configs are unchanged). score_rpn_post_nms = 0
    (the resolved DEFAULT for every model since round 5) scores with the
    reference-faithful model itself — the flm RoI kernel removed the
    proposal-count scaling that motivated trims (PERF.md). post-NMS 768
    remains a floor-validated opt-in (+2.8%; its selection shift sits AT the
    faithful path's own aug-re-roll self-noise floor on 4 seeds — the
    reference draws fresh augs per scoring pass, cald_train.py:101-228);
    deeper trims (512, 400/256) measured below the floor.

    FRCNN: trims the RPN pre/post-NMS top-n. RetinaNet analog: trims the
    per-level ``topk_candidates`` (reference 1000, retinanet_cal.py:331) to
    the --score-rpn-post-nms count — the same "fewer candidates through the
    identical postprocess" trade. The selection-fidelity cost of both trims is
    measured in EXPERIMENTS.md (fast-scoring deviation study)."""
    if not cfg.score_rpn_post_nms:
        return model
    import dataclasses as _dc

    if hasattr(model.cfg, "rpn_post_nms_top_n_test"):
        pre = min(cfg.score_rpn_pre_nms or 10 ** 9,
                  model.cfg.rpn_pre_nms_top_n_test)
        post = min(cfg.score_rpn_post_nms, model.cfg.rpn_post_nms_top_n_test)
        if (pre, post) == (model.cfg.rpn_pre_nms_top_n_test,
                           model.cfg.rpn_post_nms_top_n_test):
            return model
        return type(model)(_dc.replace(model.cfg, rpn_pre_nms_top_n_test=pre,
                                       rpn_post_nms_top_n_test=post))
    if hasattr(model.cfg, "topk_candidates"):
        topk = min(cfg.score_rpn_post_nms, model.cfg.topk_candidates)
        if topk == model.cfg.topk_candidates:
            return model
        return type(model)(_dc.replace(model.cfg, topk_candidates=topk))
    return model


def score_and_select(cfg: ALConfig, model, state, dataset, pool: ALPoolState,
                     canvases, group_ids, *, cycle: int,
                     strategy_state: dict) -> np.ndarray:
    """Dispatch on cfg.strategy; returns chosen DATASET indices.

    Multi-process: the batched scoring strategies stride the pool subset per
    process (``local``), score independently on local devices, and merge the
    score arrays host-side with a scatter + cross-process sum — every process
    then runs the identical deterministic selection. SSM's host-side
    cross-validation stage instead runs replicated on the full subset
    (identical rng -> identical picks)."""
    rng = np.random.default_rng(cfg.seed + 100 + cycle)
    subset = (pool.subsample_pool(cfg.pool_cap, rng) if cfg.pool_cap
              else pool.unlabeled.copy())
    budget = cfg.budget_num
    key = jax.random.fold_in(jax.random.key(cfg.seed + 17), cycle)
    variables = state.variables
    if jax.process_count() > 1:
        from cald_tpu.parallel import process_merge_sum, to_host_local

        # training produced a globally-replicated state; scoring runs on local
        # devices, so pull the (identical) values back to host
        variables = jax.tree.map(np.asarray, to_host_local(variables))
        local_pos = np.arange(len(subset))[jax.process_index()::jax.process_count()]
        local = subset[local_pos]
    else:
        process_merge_sum = None
        local, local_pos = subset, None

    def merge(vals):
        """(len(local), ...) per-process scores -> (len(subset), ...) global."""
        vals = np.asarray(vals)
        if local_pos is None:
            return vals
        full = np.zeros((len(subset),) + vals.shape[1:], vals.dtype)
        full[local_pos] = vals
        return process_merge_sum(full)

    def pool_loader(indices=None):
        return _loaders(cfg, dataset, local if indices is None else indices,
                        batch_size=cfg.score_batch_size,
                        train=False, canvases=canvases, group_ids=group_ids)

    if cfg.strategy == "random":
        return subset[random_select(len(subset), budget, rng)]

    if cfg.strategy == "cald":
        ccfg = CALDConfig(aug_names=tuple(expand_aug_string(cfg.augs)),
                          base_point=cfg.bp, mutual_range=cfg.mr,
                          uniform=cfg.uniform, no_mutual=cfg.no_mutual,
                          shrink_slice=cfg.score_shrink_slice)
        score_fn = strategy_state.setdefault(
            "cald_fn", make_cald_score_fn(_scoring_model(cfg, model), ccfg,
                                          cfg.num_classes))
        put_batch, _ = _mesh_hooks()
        consistency, corrs = score_pool(score_fn, variables, pool_loader(), key,
                                        local, put=put_batch)
        consistency, corrs = merge(consistency), merge(corrs)
        labeled_mean = labeled_class_counts(dataset, pool.labeled,
                                            cfg.num_classes - 1)
        picked = cald_select(consistency, corrs, labeled_mean, budget, ccfg)
        return subset[picked]

    if cfg.strategy == "ltc":
        fn = strategy_state.setdefault(
            "ltc_fn", make_ltc_score_fn(_scoring_model(cfg, model)))
        u = merge(run_ltc(fn, variables, pool_loader(), local))
        return subset[np.argsort(u, kind="stable")[:budget]]

    if cfg.strategy == "lsc":
        fn = strategy_state.setdefault(
            "lsc_fn", make_lsc_score_fn(_scoring_model(cfg, model)))
        s = merge(lsc_scores(fn, variables, pool_loader(), key, local))
        return subset[np.argsort(s, kind="stable")[:budget]]

    if cfg.strategy == "ll4al":
        lossnet = strategy_state["lossnet"]
        ll_params = strategy_state["ll_state"].params
        fn = strategy_state.setdefault("ll_fn", make_ll_score_fn(model, lossnet))
        pred = merge(ll_scores(fn, variables, ll_params, pool_loader(), local))
        return subset[ll_select(pred, budget)]

    if cfg.strategy == "vaal":
        trainer: VAALTrainer = strategy_state["vaal"]
        scores = np.zeros(len(local))
        pos = {int(i): p for p, i in enumerate(local)}
        for bi, batch in enumerate(pool_loader()):
            s = trainer.unlabeled_scores(jnp.asarray(batch.images),
                                         jax.random.fold_in(key, bi))
            for i, idx in enumerate(batch.image_idx):
                scores[pos[int(idx)]] = s[i]
        return subset[vaal_select(merge(scores), budget)]

    if cfg.strategy == "ssm":
        scfg: SSMConfig = strategy_state.setdefault("ssm_cfg", SSMConfig())
        gamma = strategy_state.setdefault("gamma", scfg.gamma)
        clslambda = strategy_state.setdefault(
            "clslambda", np.full(cfg.num_classes - 1, np.log(2.0)))
        # the SSM scoring variant shares the trained params; configs differ
        # only in postprocess. FRCNN runs the dedicated frcnn_ssm.py:44-88
        # semantics (ssm_mode: no pre-NMS score filter, per-class NMS 0.3 +
        # per-class top-k, post-NMS score filter); RetinaNet approximates with
        # NMS 0.3 through its standard path (the retina_ssm.py:540-545 random
        # per-class 500-subsample is a CUDA-memory workaround, not a semantic
        # feature — the fixed-shape TPU path scores all candidates, see
        # models/retinanet.py docstring)
        import dataclasses as _dc

        ssm_model = type(model)(_dc.replace(
            model.cfg, **({"box_nms_thresh": scfg.nms_thresh, "ssm_mode": True}
                          if hasattr(model.cfg, "box_nms_thresh")
                          else {"nms_thresh": scfg.nms_thresh})))
        # full subset on every process: the CV stage is host-side + rng-driven,
        # so it must see identical inputs everywhere to pick identically
        by_idx = _ssm_pool_detections(ssm_model, variables, pool_loader(subset),
                                      scfg)
        pool_dets = [by_idx[int(idx)] for idx in subset]
        from cald_tpu.data.loader import decode_image

        def patch_getter(pos_i, box):
            rec = dataset.record(int(subset[pos_i]))
            img = decode_image(rec.image_path).astype(np.float32)
            x1, y1, x2, y2 = (int(max(0, box[0])), int(max(0, box[1])),
                              int(min(img.shape[1], box[2])),
                              int(min(img.shape[0], box[3])))
            if x2 <= x1 or y2 <= y1:
                return None
            return img[y1:y2, x1:x2]

        cv = CrossValidator(dataset, _detect_host_fn(cfg, model, variables,
                                                     canvases), scfg, rng)
        chosen, gamma, clslambda = ssm_select(
            pool_dets, np.arange(len(subset)), budget, gamma=gamma,
            clslambda=clslambda, cross_validator=cv,
            labeled_indices=pool.labeled, rng=rng, patch_getter=patch_getter)
        strategy_state["gamma"] = gamma
        strategy_state["clslambda"] = clslambda
        return subset[chosen]

    raise ValueError(f"unknown strategy {cfg.strategy!r}")


def _ssm_pool_detections(model, variables, loader, scfg) -> dict[int, dict]:
    """One batched pass over the pool collecting the SSM per-image inputs:
    boxes (original coords), fg score rows, and the al low-confidence flag
    (frcnn_ssm.py:60,71-74)."""
    detect = jax.jit(lambda v, im, hw: model.apply(v, im, hw, method="detect"))
    out: dict[int, dict] = {}
    for batch in loader:
        dets = detect(variables, jnp.asarray(batch.images),
                      jnp.asarray(batch.valid_hw))
        dets = dets.rescale(jnp.asarray(batch.scale))
        boxes = np.asarray(dets.boxes)
        rows = np.asarray(dets.scores_cls)
        scores = np.asarray(dets.scores)
        valid = np.asarray(dets.valid)
        for i, idx in enumerate(batch.image_idx):
            m = valid[i]
            out[int(idx)] = {
                "boxes": boxes[i][m],
                "score_rows": rows[i][m][:, 1:],   # drop background column
                "al": bool(m.sum() == 0 or scores[i][m].max() < scfg.conf_thresh),
            }
    return out


def al_loop(cfg: ALConfig, *, datasets=None) -> list[dict]:
    """Run the full AL experiment; returns per-cycle result dicts."""
    from cald_tpu.parallel import initialize_distributed

    initialize_distributed()  # env-gated; single-process no-op
    cfg = cfg.resolve()
    train_ds, test_ds = datasets if datasets is not None else build_datasets(cfg)
    num_classes = len(train_ds.class_names)
    canvases = default_canvases(cfg.min_size, cfg.max_size)
    group_ids = create_aspect_ratio_groups(train_ds.aspect_ratios(),
                                           cfg.aspect_ratio_group_factor)
    test_group_ids = create_aspect_ratio_groups(test_ds.aspect_ratios(),
                                                cfg.aspect_ratio_group_factor)

    model, frozen_prefixes = build_model(cfg, num_classes)
    pool = ALPoolState.initial(len(train_ds), cfg.init_num, cfg.seed)
    strategy_state: dict = {}
    if cfg.strategy == "ll4al":
        strategy_state["lossnet"] = LossNet(num_levels=4)
    history = []

    resume_cycle = -1
    if cfg.resume:
        r_pool, _, r_meta = peek_checkpoint(cfg.resume)
        if r_pool is None:
            raise ValueError(f"--resume checkpoint {cfg.resume!r} carries no "
                             "pool state (only per-cycle driver checkpoints "
                             "are resumable)")
        pool = r_pool
        resume_cycle = int(np.asarray(r_meta["cycle"]))
        if "ssm_gamma" in r_meta:
            strategy_state["gamma"] = float(np.asarray(r_meta["ssm_gamma"]))
            strategy_state["clslambda"] = np.asarray(r_meta["ssm_clslambda"])
        print(f"--resume: restored pool (labeled {len(pool.labeled)}) at "
              f"cycle {resume_cycle}")

    profiling = profiled = False
    for cycle in range(cfg.cycles):
        if cycle < resume_cycle:
            history.append({"cycle": cycle, "resumed": True})
            continue
        t0 = time.time()
        if cfg.profile_dir and not profiled and jax.process_index() == 0:
            # the first executed cycle's device+host activity (train, eval,
            # scoring, selection) in a TensorBoard/Perfetto trace — SURVEY §5
            jax.profiler.start_trace(cfg.profile_dir)
            profiling = profiled = True
        print(f"=== cycle {cycle}: labeled {len(pool.labeled)}, "
              f"unlabeled {len(pool.unlabeled)} ===")
        first_ckpt = (os.path.join(cfg.first_checkpoint_path,
                                   f"{cfg.dataset}_{cfg.model}_1st")
                      if cfg.first_checkpoint_path else "")
        # resume restores the trained model and jumps straight to this cycle's
        # selection; ll4al/vaal adversary/LossNet carry-state is saved under
        # the checkpoint's ``extra`` key, so those resume too. Checkpoints
        # predating the key (no extra) fall back to deterministically
        # retraining the cycle on the restored pool (identical history,
        # 20 wasted epochs — the pre-round-4 behavior).
        resuming_here = cycle == resume_cycle
        if resuming_here and cfg.strategy in ("ll4al", "vaal"):
            carry = load_extra(cfg.resume)
            if not carry:
                print(f"--resume: checkpoint lacks {cfg.strategy} carry-state "
                      "(pre-round-4 format); retraining the cycle")
                resuming_here = False
            elif cfg.strategy == "ll4al":
                from cald_tpu.engine.state import TrainState

                strategy_state["ll_state"] = TrainState(
                    step=jnp.zeros((), jnp.int32),
                    params=jax.tree.map(jnp.asarray, carry["ll_params"]),
                    frozen={}, opt_state=(), tx=None)
            else:
                trainer = _make_vaal_trainer(cfg, 1, cycle)
                trainer.vae_params = jax.tree.map(jnp.asarray,
                                                  carry["vaal_vae"])
                trainer.d_params = jax.tree.map(jnp.asarray, carry["vaal_d"])
                strategy_state["vaal"] = trainer
        if resuming_here:
            print(f"--resume: loading cycle checkpoint {cfg.resume}")
            state = _fresh_state(cfg, model, frozen_prefixes, train_ds, pool,
                                 canvases, group_ids, cycle=cycle)
            state, _, _, _ = load_checkpoint(cfg.resume, state)
        elif cfg.skip and cycle == 0 and first_ckpt and os.path.isdir(first_ckpt):
            # reuse the saved first-cycle model instead of retraining
            # (reference --skip, cald_train.py:349-356)
            print(f"--skip: loading first-cycle checkpoint {first_ckpt}")
            state = _fresh_state(cfg, model, frozen_prefixes, train_ds, pool,
                                 canvases, group_ids, cycle=0)
            state, skip_pool, _, _ = load_checkpoint(first_ckpt, state)
            if skip_pool is not None:
                # the checkpoint knows the split it was trained on; keep it
                # (a fresh split from a different --seed would silently
                # mismatch the weights — the round-2 VERDICT's --skip bug)
                pool = skip_pool
        elif cfg.strategy == "ll4al":
            state, ll_state = _train_cycle_ll4al(
                cfg, model, frozen_prefixes, strategy_state["lossnet"],
                train_ds, pool, canvases, group_ids, cycle=cycle)
            if jax.process_count() > 1:
                # like `state` below: globally-replicated -> host numpy so
                # the process-local LossNet scoring pass can consume it
                from cald_tpu.parallel import to_host_local

                ll_state = to_host_local(ll_state)
            strategy_state["ll_state"] = ll_state
        elif cfg.strategy == "vaal":
            state, strategy_state["vaal"] = _train_cycle_vaal(
                cfg, model, frozen_prefixes, train_ds, pool, canvases,
                group_ids, cycle=cycle)
        else:
            state = train_cycle(cfg, model, frozen_prefixes, train_ds, pool,
                                canvases, group_ids, cycle=cycle)
        if jax.process_count() > 1:
            # globally-replicated training state -> host numpy, so eval/
            # scoring/checkpointing below run process-locally
            from cald_tpu.parallel import to_host_local

            state = to_host_local(state)
        if (cycle == 0 and first_ckpt
                and not (cfg.skip and os.path.isdir(first_ckpt))
                and jax.process_index() == 0):
            # save the first-cycle model for later --skip runs
            # (reference cald_train.py:418-426); the pool rides along so a
            # --skip run restores the exact split these weights saw
            save_checkpoint(first_ckpt, state, pool=pool, meta={"cycle": 0})
        if cfg.strategy == "vaal" and "vaal" not in strategy_state:
            # --skip path loaded the task model without the interleaved
            # adversarial training; run the VAE+D epochs standalone
            loader0 = _loaders(cfg, train_ds, pool.labeled,
                               batch_size=cfg.batch_size, train=True,
                               canvases=canvases, group_ids=group_ids)
            trainer = _make_vaal_trainer(cfg, max(_sync_len(len(loader0)), 1),
                                         cycle)
            if jax.process_count() > 1 or jax.device_count() > 1:
                trainer.place(*_mesh_hooks(train=True))
            for epoch in range(cfg.epochs):
                _vaal_adversary_epoch(cfg, trainer, train_ds, pool, canvases,
                                      group_ids, cycle=cycle, epoch=epoch)
            if jax.process_count() > 1:
                trainer.localize()
            strategy_state["vaal"] = trainer

        stats = {}
        if resuming_here:
            stats = {"resumed": True}   # eval already ran before the save
        elif cfg.eval_every_cycle:
            test_indices = range(len(test_ds))
            if jax.process_count() > 1:
                from cald_tpu.parallel import process_shard

                test_indices = process_shard(test_indices, pad=False)
            test_loader = _loaders(cfg, test_ds, test_indices,
                                   batch_size=cfg.score_batch_size, train=False,
                                   canvases=canvases, group_ids=test_group_ids)
            stats = evaluate(model, state.variables, test_loader, test_ds,
                             kind=cfg.eval_kind, classwise=cfg.classwise)

        if cfg.output_dir and jax.process_index() == 0 and not resuming_here:
            meta: dict = {"cycle": cycle}
            if "gamma" in strategy_state:   # SSM's adapted carry-state
                meta["ssm_gamma"] = strategy_state["gamma"]
                meta["ssm_clslambda"] = strategy_state["clslambda"]
            extra: dict = {}
            if "ll_state" in strategy_state:    # ll4al's trained LossNet
                extra["ll_params"] = strategy_state["ll_state"].params
            if "vaal" in strategy_state:        # VAAL's trained VAE + D
                extra["vaal_vae"] = strategy_state["vaal"].vae_params
                extra["vaal_d"] = strategy_state["vaal"].d_params
            save_checkpoint(os.path.join(cfg.output_dir, f"cycle_{cycle}"),
                            state, pool=pool, rng=jax.random.key(cfg.seed),
                            meta=meta, extra=extra)

        if cycle < cfg.cycles - 1:
            chosen = score_and_select(cfg, model, state, train_ds, pool,
                                      canvases, group_ids, cycle=cycle,
                                      strategy_state=strategy_state)
            pool = pool.select(np.asarray(chosen))
        if profiling:
            jax.profiler.stop_trace()
            profiling = False
            print(f"profile trace written to {cfg.profile_dir}")
        import hashlib

        digest = hashlib.sha1(
            np.sort(np.asarray(pool.labeled)).tobytes()).hexdigest()[:12]
        history.append({"cycle": cycle, "labeled": int(len(pool.labeled)),
                        "labeled_digest": digest, "eval": stats,
                        "time_s": time.time() - t0})
    return history


def _train_cycle_ll4al(cfg, model, frozen_prefixes, lossnet, dataset, pool,
                       canvases, group_ids, *, cycle: int):
    """Joint detector+LossNet training (ll_train.py:55-133), on the global
    data mesh like train_cycle: per-process loader shards assemble into a
    global batch, both states are replicated, and the jitted joint step's
    batch means give XLA the gradient all-reduce (SURVEY §2.7-2.8). The
    LossPredLoss ranking pairs are formed over the GLOBAL batch inside jit —
    identical semantics to a single process seeing the concatenated batch."""
    from cald_tpu.engine.state import TrainState

    example = (jnp.zeros((cfg.batch_size, canvases[0].height, canvases[0].width, 3)),
               jnp.zeros((cfg.batch_size, 2), jnp.int32))
    loader0 = _loaders(cfg, dataset, pool.labeled, batch_size=cfg.batch_size,
                       train=True, canvases=canvases, group_ids=group_ids)
    sched = multistep_with_warmup(cfg.lr, max(len(loader0), 1),
                                  milestones=cfg.lr_steps, gamma=cfg.lr_gamma,
                                  warmup_iters=cfg.warmup_iters)
    task_state = create_train_state(
        model, example,
        lambda p: make_sgd(sched, momentum=cfg.momentum,
                           weight_decay=cfg.weight_decay, params=p,
                           frozen_prefixes=frozen_prefixes), seed=cfg.seed)
    task_state = _apply_pretrained_backbone(task_state, cfg)
    # LossNet params need example features
    feats = jax.eval_shape(
        lambda v: model.apply(v, example[0], method="extract_features"),
        task_state.variables)
    dummy_feats = [jnp.zeros(f.shape, f.dtype) for f in feats[:4]]
    ll_params = jax.jit(lossnet.init)(jax.random.key(cfg.seed + 1), dummy_feats)["params"]
    ll_tx = make_sgd(sched, momentum=cfg.momentum, weight_decay=cfg.weight_decay)
    ll_state = TrainState(step=jnp.zeros((), jnp.int32), params=ll_params,
                          frozen={}, opt_state=ll_tx.init(ll_params), tx=ll_tx)

    put_batch, put_state = _mesh_hooks(train=True)
    task_state = put_state(task_state)
    ll_state = put_state(ll_state)
    step = make_ll_train_step(model, lossnet, ll_weight=cfg.ll_weight)
    for epoch in range(cfg.epochs):
        loader = _loaders(cfg, dataset, pool.labeled, batch_size=cfg.batch_size,
                          train=True, canvases=canvases, group_ids=group_ids,
                          seed=cfg.seed + cycle * 1000 + epoch)
        detach = epoch >= cfg.task_epochs
        metrics = None
        for bi, batch in enumerate(_lockstep(loader)):
            b = put_batch(batch)
            # host-derived step rng: identical on every process, no device sync
            rng = jax.random.fold_in(jax.random.key(cfg.seed + 3),
                                     (cycle * 1000 + epoch) * 100000 + bi)
            task_state, ll_state, metrics = step(
                task_state, ll_state, b.images, b.valid_hw, b.boxes,
                b.labels, b.box_valid, rng, detach_features=detach)
        last = ("empty loader" if metrics is None
                else f"loss {float(metrics['loss']):.4f}")
        print(f"ll4al cycle {cycle} epoch {epoch}: {last}")
    return task_state, ll_state


def _make_vaal_trainer(cfg, steps_per_epoch: int, cycle: int) -> VAALTrainer:
    """Fresh VAE+D per cycle with the reference optimizers: SGD lr/10 for the
    VAE, SGD lr for the discriminator, both on the task's MultiStep+warmup
    schedule (vaal_train.py:221-238)."""
    vae_sched = multistep_with_warmup(cfg.lr / 10, steps_per_epoch,
                                      milestones=cfg.lr_steps,
                                      gamma=cfg.lr_gamma,
                                      warmup_iters=cfg.warmup_iters)
    d_sched = multistep_with_warmup(cfg.lr, steps_per_epoch,
                                    milestones=cfg.lr_steps, gamma=cfg.lr_gamma,
                                    warmup_iters=cfg.warmup_iters)
    return VAALTrainer(
        seed=cfg.seed + cycle,
        vae_tx=make_sgd(vae_sched, momentum=cfg.momentum,
                        weight_decay=cfg.weight_decay),
        d_tx=make_sgd(d_sched, momentum=cfg.momentum,
                      weight_decay=cfg.weight_decay))


def _vaal_adversary_epoch(cfg, trainer: VAALTrainer, dataset, pool, canvases,
                          group_ids, *, cycle: int, epoch: int):
    """One epoch of VAE+D training: len(labeled_loader) steps over shuffled
    labeled/unlabeled batches (vaal_train.py:99-148 runs this after every task
    epoch; the unlabeled loader is cycled when shorter).

    Runs on the global data mesh like the detector: per-process loader shards
    stride both pools, the trainer's placed batches concatenate into global
    256x256 arrays, and the globally-agreed step counts (_sync_len) keep the
    collective steps in lockstep."""
    import itertools

    seed = cfg.seed + cycle * 1000 + epoch
    lab_loader = _loaders(cfg, dataset, pool.labeled,
                          batch_size=cfg.batch_size, train=True,
                          canvases=canvases, group_ids=group_ids, seed=seed)
    unlab_loader = _loaders(cfg, dataset, pool.unlabeled,
                            batch_size=cfg.batch_size, train=True,
                            canvases=canvases, group_ids=group_ids,
                            seed=seed + 1)
    key = jax.random.fold_in(jax.random.key(cfg.seed + 31),
                             cycle * 1000 + epoch)
    vloss = dloss = float("nan")
    n_lab = _sync_len(len(lab_loader))
    if _sync_len(len(unlab_loader)) == 0:
        return
    unlab_iter = itertools.cycle(unlab_loader)
    for bi, lb in enumerate(itertools.islice(iter(lab_loader), n_lab)):
        ub = next(unlab_iter)
        vloss, dloss = trainer.train_step(lb.images, ub.images,
                                          jax.random.fold_in(key, bi))
    print(f"vaal cycle {cycle} epoch {epoch}: vae_loss {vloss:.2f} "
          f"dis_loss {dloss:.4f}")


def _train_cycle_vaal(cfg, model, frozen_prefixes, dataset, pool, canvases,
                      group_ids, *, cycle: int):
    """Task + VAE + D trained interleaved every epoch (vaal_train.py:248-251:
    train_one_epoch covers the task loop AND the adversarial loop)."""
    state = _fresh_state(cfg, model, frozen_prefixes, dataset, pool, canvases,
                         group_ids, cycle=cycle)
    put_batch, put_state = _mesh_hooks(train=True)
    state = put_state(state)
    step_fn = make_train_step(model)
    loader0 = _loaders(cfg, dataset, pool.labeled, batch_size=cfg.batch_size,
                       train=True, canvases=canvases, group_ids=group_ids,
                       seed=cfg.seed + cycle)
    trainer = _make_vaal_trainer(cfg, max(_sync_len(len(loader0)), 1), cycle)
    if jax.process_count() > 1 or jax.device_count() > 1:
        trainer.place(put_batch, put_state)
    for epoch in range(cfg.epochs):
        loader = _loaders(cfg, dataset, pool.labeled, batch_size=cfg.batch_size,
                          train=True, canvases=canvases, group_ids=group_ids,
                          seed=cfg.seed + cycle * 1000 + epoch)
        state, _ = train_one_epoch(
            state, step_fn, (put_batch(b) for b in _lockstep(loader)),
            jax.random.fold_in(jax.random.key(cfg.seed), epoch),
            epoch=epoch, cycle=cycle, print_freq=cfg.print_freq)
        _vaal_adversary_epoch(cfg, trainer, dataset, pool, canvases, group_ids,
                              cycle=cycle, epoch=epoch)
    if jax.process_count() > 1:
        trainer.localize()
    return state, trainer
