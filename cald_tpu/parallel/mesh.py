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

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def data_mesh(devices=None, axis: str = "data") -> Mesh:
    """1-D data-parallel mesh over all (or the given) devices."""
    devices = np.asarray(devices if devices is not None else jax.devices())
    return Mesh(devices, axis_names=(axis,))


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
