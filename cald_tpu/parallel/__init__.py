"""Mesh + sharding helpers (the TPU-native replacement for the reference's NCCL
layer, SURVEY.md §2.8).

Data parallelism is declarative: build a mesh, shard batches over the 'data'
axis, replicate params — XLA inserts the gradient all-reduce over ICI. The
embarrassingly parallel AL pool-scoring stage shards the pool the same way and
gathers the (tiny) score vector on host.
"""

from cald_tpu.parallel.mesh import (
    batch_sharding,
    data_mesh,
    host_gather,
    replicate,
    shard_batch,
)

__all__ = ["data_mesh", "batch_sharding", "shard_batch", "replicate", "host_gather"]
