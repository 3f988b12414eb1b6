"""Device-mesh parallelism utilities."""

from deepof_tpu.parallel.mesh import (
    create_mesh,
    data_sharding,
    distributed_init_if_needed,
    is_main_process,
    ragged_eval,
    replicate_sharding,
    shard_batch,
)

__all__ = [
    "create_mesh",
    "data_sharding",
    "distributed_init_if_needed",
    "is_main_process",
    "ragged_eval",
    "replicate_sharding",
    "shard_batch",
]
