"""Checkpointing via orbax, including AL pool state and RNG.

The reference saves only model weights per cycle (cald_train.py:418-426) and the
labeled/unlabeled split is lost on restart (SURVEY.md §5). A cald_tpu checkpoint
is one orbax PyTree checkpoint: {'params', 'frozen', 'opt_state', 'step',
'pool' (ALPoolState dict), 'rng' (key data), 'meta'} — a cycle is resumable from
exactly where it stopped.
"""

from __future__ import annotations

import os
from typing import Any

import jax
import numpy as np
import orbax.checkpoint as ocp

from cald_tpu.data.pool import ALPoolState
from cald_tpu.engine.state import TrainState


def save_checkpoint(path: str, state: TrainState, *, pool: ALPoolState | None = None,
                    rng: jax.Array | None = None, meta: dict | None = None,
                    extra: dict | None = None):
    """Write a self-describing checkpoint directory at ``path``.

    ``extra``: an arbitrary array pytree for strategy carry-state that lives
    outside the task TrainState (LossNet params for ll4al, VAE+D params for
    VAAL) so ``--resume`` covers every strategy, not just the task-model ones.
    """
    payload: dict[str, Any] = {
        "params": state.params,
        "frozen": state.frozen,
        "opt_state": state.opt_state,
        "step": state.step,
    }
    if pool is not None:
        payload["pool"] = pool.to_dict()
    if rng is not None:
        payload["rng"] = jax.random.key_data(rng)
    if meta:
        payload["meta"] = {k: np.asarray(v) for k, v in meta.items()}
    if extra:
        payload["extra"] = extra
    path = os.path.abspath(path)
    with ocp.PyTreeCheckpointer() as ckptr:
        ckptr.save(path, payload, force=True)


def peek_checkpoint(path: str):
    """Restore only the AL bookkeeping — (pool | None, rng | None, meta dict) —
    without needing a model/optimizer template. The driver's ``--resume`` uses
    this first (the restored pool determines the cycle's loader sizes and hence
    the optimizer-schedule template that ``load_checkpoint`` then fills)."""
    path = os.path.abspath(path)
    with ocp.PyTreeCheckpointer() as ckptr:
        raw = ckptr.restore(path)
    pool = ALPoolState.from_dict(raw["pool"]) if "pool" in raw else None
    rng = (jax.random.wrap_key_data(np.asarray(raw["rng"]))
           if "rng" in raw else None)
    return pool, rng, raw.get("meta", {})


def load_extra(path: str) -> dict:
    """Restore only the strategy carry-state pytree saved under ``extra``
    (host numpy arrays; {} when the checkpoint predates the key)."""
    path = os.path.abspath(path)
    with ocp.PyTreeCheckpointer() as ckptr:
        raw = ckptr.restore(path)
    return raw.get("extra", {})


def load_checkpoint(path: str, state: TrainState):
    """Restore into the given (template) TrainState.

    Returns (state, pool | None, rng | None, meta dict).
    """
    template: dict[str, Any] = {
        "params": state.params,
        "frozen": state.frozen,
        "opt_state": state.opt_state,
        "step": state.step,
    }
    path = os.path.abspath(path)
    with ocp.PyTreeCheckpointer() as ckptr:
        # restore unstructured first to discover optional keys
        raw = ckptr.restore(path)
        restore_keys = {k: template[k] for k in template if k in raw}
        restored = ckptr.restore(path, args=ocp.args.PyTreeRestore(
            item={**raw, **restore_keys}))
    new_state = state.replace(
        params=restored["params"], frozen=restored["frozen"],
        opt_state=restored["opt_state"], step=restored["step"])
    pool = ALPoolState.from_dict(restored["pool"]) if "pool" in restored else None
    rng = (jax.random.wrap_key_data(np.asarray(restored["rng"]))
           if "rng" in restored else None)
    meta = restored.get("meta", {})
    return new_state, pool, rng, meta
