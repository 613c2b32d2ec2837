from pggan_tpu.parallel.mesh import (
    data_parallel_mesh,
    initialize_distributed,
    replicate,
    shard_batch,
)

__all__ = [
    "data_parallel_mesh",
    "initialize_distributed",
    "replicate",
    "shard_batch",
]
