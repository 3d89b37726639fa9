"""Device mesh + sharding utilities.

Maps the reference's distributed helpers (/root/reference/detection/utils.py:
75-142,258-325 — NCCL init, all_gather-of-pickles, reduce_dict) onto JAX:

  reference                      cald_tpu
  ---------                      --------
  init_process_group(nccl)   ->  data_mesh() over jax.devices() (+
                                 jax.distributed.initialize() for multi-host,
                                 done by the caller once per process)
  DistributedSampler          ->  shard_batch: batch dim sharded over 'data'
  reduce_dict (loss logging)  ->  automatic: jitted loss is a mean over the
                                 global batch; XLA inserts the psum
  utils.all_gather(pickles)   ->  host_gather: fixed-shape device arrays ->
                                 fully-addressable host numpy
"""

from __future__ import annotations

import os
import pickle

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

_DIST = {"attempted": False}


def initialize_distributed(*, coordinator: str | None = None,
                           num_processes: int | None = None,
                           process_id: int | None = None) -> bool:
    """Multi-process wiring: the analog of the reference's
    init_distributed_mode (/root/reference/detection/utils.py:302-324), mapped
    onto ``jax.distributed.initialize``.

    Activation, in order:
      * explicit args (tests / bespoke launchers);
      * env JAX_COORDINATOR_ADDRESS + JAX_NUM_PROCESSES + JAX_PROCESS_ID
        (the torchrun-style launch);
      * env CALD_TPU_DISTRIBUTED=1 -> argless initialize() (TPU pod slices,
        where JAX autodetects the topology).
    Anything else is a single-process no-op (the reference's "Not using
    distributed mode"). Idempotent; must run before the first backend query.

    Returns True when more than one process is participating.
    """
    if _DIST["attempted"]:
        return jax.process_count() > 1
    _DIST["attempted"] = True
    coordinator = coordinator or os.environ.get("JAX_COORDINATOR_ADDRESS")
    try:
        if coordinator:
            jax.distributed.initialize(
                coordinator_address=coordinator,
                num_processes=(num_processes
                               or int(os.environ["JAX_NUM_PROCESSES"])),
                process_id=(process_id if process_id is not None
                            else int(os.environ["JAX_PROCESS_ID"])))
        elif os.environ.get("CALD_TPU_DISTRIBUTED") == "1":
            jax.distributed.initialize()
        else:
            return False
    except RuntimeError as e:  # already initialized (e.g. by the launcher)
        if "already initialized" not in str(e):
            raise
    return jax.process_count() > 1


def data_mesh(devices=None, axis: str = "data") -> Mesh:
    """1-D data-parallel mesh over all (or the given) devices."""
    devices = np.asarray(devices if devices is not None else jax.devices())
    return Mesh(devices, axis_names=(axis,))


def local_data_mesh(axis: str = "data") -> Mesh:
    """Mesh over this process's addressable devices only — for the eval/scoring
    loops, where each process works an independent shard of the data and merges
    host-side (process_shard + merge below)."""
    return data_mesh(jax.local_devices(), axis)


def batch_sharding(mesh: Mesh, axis: str = "data") -> NamedSharding:
    """Sharding that splits axis 0 (the batch) across the mesh."""
    return NamedSharding(mesh, P(axis))


def replicate(tree, mesh: Mesh):
    """Fully replicate a pytree (params) over the mesh."""
    sharding = NamedSharding(mesh, P())
    return jax.device_put(tree, sharding)


def shard_batch(tree, mesh: Mesh, axis: str = "data"):
    """Put a host batch pytree onto the mesh, axis 0 sharded.

    For full DP efficiency pick batch_size % n_devices == 0
    (grouped_batch_indices pads batches to a fixed size). Leaves whose leading
    dim does not divide the mesh fall back to replication — correct but
    redundant compute, so it is a degradation, not an error (small CPU-mesh
    tests, odd last batches).
    """
    sharding = batch_sharding(mesh, axis)
    rep = NamedSharding(mesh, P())

    def put(x):
        divisible = (hasattr(x, "shape") and getattr(x, "ndim", 0) >= 1
                     and x.shape[0] % mesh.size == 0)
        return jax.device_put(x, sharding if divisible else rep)

    return jax.tree.map(put, tree)


def host_gather(x) -> np.ndarray:
    """Device (possibly sharded) array -> host numpy. For multi-host topologies
    use jax.experimental.multihost_utils.process_allgather at the call site."""
    return np.asarray(jax.device_get(x))


# ---------------------------------------------------------------------------
# multi-process (multi-host) helpers
# ---------------------------------------------------------------------------

def process_shard(indices, *, pad: bool = True) -> np.ndarray:
    """This process's strided slice of an index list — the DistributedSampler
    analog (reference utils.py wraps torch's). With ``pad`` the list is wrapped
    to a multiple of process_count first so every process sees the SAME number
    of indices (and therefore builds the same number of batches: collective
    train steps stay in lockstep)."""
    idx = np.asarray(list(indices))
    p, n = jax.process_count(), jax.process_index()
    if p == 1:
        return idx
    if pad and len(idx) % p:
        idx = np.concatenate([idx, idx[: p - len(idx) % p]])
    return idx[n::p]


def all_gather_objects(obj) -> list:
    """Gather one picklable object per process; every process receives the full
    ``process_count()``-long list, ordered by process index.

    The analog of the reference's ``utils.all_gather`` (utils.py:75-115 —
    pickle -> byte tensor -> pad to max -> NCCL all_gather -> unpickle), built
    on ``multihost_utils.process_allgather`` over a padded uint8 buffer.
    """
    if jax.process_count() == 1:
        return [obj]
    from jax.experimental import multihost_utils as mu

    payload = np.frombuffer(pickle.dumps(obj), np.uint8)
    sizes = mu.process_allgather(np.asarray([payload.size], np.int64))
    sizes = np.asarray(sizes).reshape(-1)
    buf = np.zeros(int(sizes.max()), np.uint8)
    buf[: payload.size] = payload
    gathered = np.asarray(mu.process_allgather(buf))
    return [pickle.loads(gathered[i, : int(sizes[i])].tobytes())
            for i in range(jax.process_count())]


def process_merge_sum(x) -> np.ndarray:
    """Element-wise sum of a host array across processes. The score-merge
    primitive: each process scatters its shard's scores into a zero-filled
    full-length array, the sum reassembles the global array identically on
    every process (so selection stays deterministic and replicated)."""
    x = np.asarray(x)
    if jax.process_count() == 1:
        return x
    from jax.experimental import multihost_utils as mu

    return np.asarray(mu.process_allgather(x)).sum(axis=0)


def global_batch(tree, mesh: Mesh, axis: str = "data"):
    """Form a global batch-sharded array from per-process local batches: the
    global leading dim is the concatenation over processes, each local piece
    sharded over this process's devices. Local batch size must divide
    ``local_device_count``ly (padded fixed-size batches: pick
    batch_size % local_device_count == 0)."""
    from jax.experimental import multihost_utils as mu

    return mu.host_local_array_to_global_array(tree, mesh, P(axis))


def global_replicate(tree, mesh: Mesh):
    """Replicate identical per-process host values (params/opt state built from
    the same seed) over a global mesh."""
    from jax.experimental import multihost_utils as mu

    def put(x):
        if not hasattr(x, "shape") and not isinstance(x, (np.ndarray,)):
            return x
        return mu.host_local_array_to_global_array(np.asarray(x), mesh, P())

    return jax.tree.map(put, tree)


def to_host_local(tree):
    """Global (possibly non-addressable) arrays -> host numpy, assuming fully
    replicated values (the state layout used here). Checkpointing in
    multi-process mode converts through this, then only process 0 writes."""
    if jax.process_count() == 1:
        return jax.tree.map(
            lambda x: np.asarray(x) if hasattr(x, "shape") else x, tree)
    from jax.experimental import multihost_utils as mu

    def get(x):
        if not hasattr(x, "sharding"):
            return x
        mesh = x.sharding.mesh
        local = mu.global_array_to_host_local_array(
            x, mesh, P())
        return np.asarray(local)

    return jax.tree.map(get, tree)
