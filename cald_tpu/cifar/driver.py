"""LL4AL CIFAR classification demo: the active-learning loop of
/root/reference/ll4al/main.py (trials x cycles x (train -> test -> score
unlabeled subset -> add top-K by predicted loss)) rebuilt TPU-first.

Reference semantics preserved:
  - config constants (ll4al/config.py): BATCH 128, SUBSET 10000, ADDENDUM
    1000, EPOCH 200, MILESTONES [160], EPOCHL 120-style detach, MARGIN/WEIGHT,
    SGD(0.1, 0.9, 5e-4) for both nets, MultiStepLR;
  - joint step: backbone CE (per-sample, meaned) + WEIGHT * LossPredLoss on
    the pair-flipped batch; features detached into LossNet after EPOCHL
    epochs (ll4al/main.py:92-124);
  - selection: random SUBSET of the unlabeled pool, ascending argsort of
    predicted loss, take the top ADDENDUM (ll4al/main.py:259-270).

TPU re-design: one jitted train step (fused augment+normalize+forward+both
losses+update, BatchNorm stats threaded functionally), one jitted eval step,
and one jitted scoring step over fixed-size batches — no per-sample host
transforms, no .cuda() shuffling.
"""

from __future__ import annotations

import dataclasses
import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
import optax

from cald_tpu.cifar.data import augment_batch, normalize
from cald_tpu.cifar.resnet import CifarResNet18
from cald_tpu.models.lossnet import LossNet, loss_pred_loss


@dataclasses.dataclass(frozen=True)
class CifarALConfig:
    """ll4al/config.py constants."""

    num_train: int = 50000
    batch: int = 128
    subset: int = 10000
    addendum: int = 1000
    margin: float = 1.0
    weight: float = 1.0
    trials: int = 3
    cycles: int = 10
    epochs: int = 200
    lr: float = 0.1
    milestones: tuple = (160,)
    epoch_loss: int = 120
    momentum: float = 0.9
    weight_decay: float = 5e-4
    num_classes: int = 10
    interm_dim: int = 128
    width: int = 64
    seed: int = 0


def _make_tx(cfg: CifarALConfig, steps_per_epoch: int):
    """SGD + MultiStepLR, epoch-granular like torch's scheduler.step()."""
    boundaries = {int(m) * steps_per_epoch: 0.1 for m in cfg.milestones}
    sched = optax.piecewise_constant_schedule(cfg.lr, boundaries)
    return optax.chain(
        optax.add_decayed_weights(cfg.weight_decay),
        optax.sgd(learning_rate=sched, momentum=cfg.momentum))


class CifarLL4AL:
    """Backbone + LossNet pair with jitted train/eval/score steps."""

    def __init__(self, cfg: CifarALConfig, steps_per_epoch: int):
        self.cfg = cfg
        self.backbone = CifarResNet18(num_classes=cfg.num_classes,
                                      width=cfg.width)
        self.lossnet = LossNet(num_levels=4, interm_dim=cfg.interm_dim)
        dummy = jnp.zeros((2, 32, 32, 3))
        v = jax.jit(partial(self.backbone.init, train=False))(
            jax.random.key(cfg.seed), dummy)
        self.params = v["params"]
        self.bn_stats = v["batch_stats"]
        _, feats = self.backbone.apply(v, dummy, train=False)
        self.ll_params = jax.jit(self.lossnet.init)(
            jax.random.key(cfg.seed + 1), feats)["params"]
        self.tx = _make_tx(cfg, steps_per_epoch)
        self.opt = self.tx.init(self.params)
        self.ll_tx = _make_tx(cfg, steps_per_epoch)
        self.ll_opt = self.ll_tx.init(self.ll_params)
        self._train_step = jax.jit(self._make_train_step(),
                                   static_argnames=("detach",))
        self._eval_batch = jax.jit(self._make_eval())
        self._score_batch = jax.jit(self._make_score())

    def _make_train_step(self):
        cfg, backbone, lossnet = self.cfg, self.backbone, self.lossnet
        tx, ll_tx = self.tx, self.ll_tx

        def step(params, ll_params, bn_stats, opt, ll_opt, images, labels,
                 key, *, detach: bool):
            images = normalize(augment_batch(images, key))

            def losses(params, ll_params):
                (logits, feats), updates = backbone.apply(
                    {"params": params, "batch_stats": bn_stats}, images,
                    train=True, mutable=["batch_stats"])
                ce = optax.softmax_cross_entropy_with_integer_labels(
                    logits, labels)                       # (B,) per-sample
                if detach:
                    feats = [jax.lax.stop_gradient(f) for f in feats]
                pred = lossnet.apply({"params": ll_params}, feats)
                mod = loss_pred_loss(pred, ce, margin=cfg.margin)
                loss = jnp.mean(ce) + cfg.weight * mod
                return loss, (updates["batch_stats"], jnp.mean(ce), mod)

            (loss, (bn_stats, ce, mod)), grads = jax.value_and_grad(
                losses, argnums=(0, 1), has_aux=True)(params, ll_params)
            up, opt = tx.update(grads[0], opt, params)
            params = optax.apply_updates(params, up)
            ll_up, ll_opt = ll_tx.update(grads[1], ll_opt, ll_params)
            ll_params = optax.apply_updates(ll_params, ll_up)
            return params, ll_params, bn_stats, opt, ll_opt, {
                "loss": loss, "ce": ce, "module": mod}

        return step

    def _make_eval(self):
        backbone = self.backbone

        def run(params, bn_stats, images, labels):
            logits, _ = backbone.apply(
                {"params": params, "batch_stats": bn_stats},
                normalize(images), train=False)
            return jnp.sum(jnp.argmax(logits, -1) == labels)

        return run

    def _make_score(self):
        backbone, lossnet = self.backbone, self.lossnet

        def run(params, ll_params, bn_stats, images):
            _, feats = backbone.apply(
                {"params": params, "batch_stats": bn_stats},
                normalize(images), train=False)
            return lossnet.apply({"params": ll_params}, feats)

        return run

    def train_epoch(self, images, labels, order, epoch: int, key: jax.Array):
        """Fixed-shape note: a trailing partial batch is dropped (one compiled
        step shape; the reference's torch loader pads nothing and LossPredLoss
        asserts even batch sizes anyway, ll4al/main.py:66)."""
        cfg = self.cfg
        detach = epoch > cfg.epoch_loss   # strict >, ll4al/main.py:107
        metrics = {}
        for bi in range(0, len(order) - cfg.batch + 1, cfg.batch):
            idx = order[bi: bi + cfg.batch]
            (self.params, self.ll_params, self.bn_stats, self.opt,
             self.ll_opt, metrics) = self._train_step(
                self.params, self.ll_params, self.bn_stats, self.opt,
                self.ll_opt, jnp.asarray(images[idx]), jnp.asarray(labels[idx]),
                jax.random.fold_in(key, bi), detach=detach)
        return metrics

    def test_accuracy(self, images, labels, batch: int = 500) -> float:
        correct = 0
        for bi in range(0, len(images), batch):
            xs = images[bi: bi + batch]
            pad = batch - len(xs)
            ys = labels[bi: bi + batch]
            if pad:
                xs = np.concatenate([xs, np.zeros((pad,) + xs.shape[1:],
                                                  xs.dtype)])
                ys = np.concatenate([ys, np.full((pad,), -1, ys.dtype)])
            correct += int(self._eval_batch(self.params, self.bn_stats,
                                            jnp.asarray(xs), jnp.asarray(ys)))
        return 100.0 * correct / len(images)

    def uncertainty(self, images, indices, batch: int = 500) -> np.ndarray:
        out = np.zeros((len(indices),), np.float64)
        idx = np.asarray(indices)
        for bi in range(0, len(idx), batch):
            sel = idx[bi: bi + batch]
            xs = images[sel]
            pad = batch - len(sel)
            if pad:
                xs = np.concatenate([xs, np.zeros((pad,) + xs.shape[1:],
                                                  xs.dtype)])
            p = np.asarray(self._score_batch(self.params, self.ll_params,
                                             self.bn_stats, jnp.asarray(xs)))
            out[bi: bi + len(sel)] = p[: len(sel)]
        return out


def al_cifar_loop(cfg: CifarALConfig, train_images, train_labels, test_images,
                  test_labels, *, trial: int = 0, print_fn=print) -> list[dict]:
    """One trial of the reference loop (ll4al/main.py:219-290)."""
    rng = np.random.default_rng(cfg.seed + 1000 * trial)
    indices = rng.permutation(len(train_images))
    labeled = list(indices[: cfg.addendum])
    unlabeled = list(indices[cfg.addendum:])

    steps_per_epoch = max(len(labeled) // cfg.batch, 1)
    model = CifarLL4AL(cfg, steps_per_epoch)
    history = []
    for cycle in range(cfg.cycles):
        t0 = time.time()
        # fresh optimizers/schedulers every cycle (ll4al/main.py:241-252);
        # params persist across cycles like the reference's models dict
        model.tx = _make_tx(cfg, max(len(labeled) // cfg.batch, 1))
        model.opt = model.tx.init(model.params)
        model.ll_tx = _make_tx(cfg, max(len(labeled) // cfg.batch, 1))
        model.ll_opt = model.ll_tx.init(model.ll_params)
        key = jax.random.fold_in(jax.random.key(cfg.seed), cycle)
        for epoch in range(cfg.epochs):
            order = rng.permutation(labeled)
            model.train_epoch(train_images, train_labels, order, epoch,
                              jax.random.fold_in(key, epoch))
        acc = model.test_accuracy(test_images, test_labels)
        print_fn(f"Trial {trial + 1} || Cycle {cycle + 1}/{cfg.cycles} || "
                 f"Label set size {len(labeled)}: Test acc {acc:.2f} "
                 f"({time.time() - t0:.0f}s)")
        history.append({"cycle": cycle, "labeled": len(labeled), "acc": acc})

        if cycle == cfg.cycles - 1:
            break
        rng.shuffle(unlabeled)
        subset = unlabeled[: cfg.subset]
        u = model.uncertainty(train_images, subset)
        arg = np.argsort(u, kind="stable")          # ascending, main.py:267
        subset = np.asarray(subset)
        labeled += list(subset[arg][-cfg.addendum:])
        unlabeled = list(subset[arg][: -cfg.addendum]) + unlabeled[cfg.subset:]
    return history
