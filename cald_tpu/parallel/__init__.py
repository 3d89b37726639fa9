"""Mesh + sharding helpers (the TPU-native replacement for the reference's NCCL
layer, SURVEY.md §2.8).

Data parallelism is declarative: build a mesh, shard batches over the 'data'
axis, replicate params — XLA inserts the gradient all-reduce over ICI. The
embarrassingly parallel AL pool-scoring stage shards the pool the same way and
gathers the (tiny) score vector on host.
"""

from cald_tpu.parallel.mesh import (
    all_gather_objects,
    batch_sharding,
    data_mesh,
    global_batch,
    global_replicate,
    host_gather,
    initialize_distributed,
    local_data_mesh,
    process_merge_sum,
    process_shard,
    replicate,
    shard_batch,
    to_host_local,
)

__all__ = [
    "data_mesh", "local_data_mesh", "batch_sharding", "shard_batch",
    "replicate", "host_gather", "initialize_distributed", "process_shard",
    "all_gather_objects", "process_merge_sum", "global_batch",
    "global_replicate", "to_host_local",
]
