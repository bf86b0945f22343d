from .mesh import (
    DATA_AXIS,
    make_mesh,
    replicate,
    shard_batch,
    batch_sharding,
    replicated_sharding,
)

__all__ = [
    "DATA_AXIS",
    "make_mesh",
    "replicate",
    "shard_batch",
    "batch_sharding",
    "replicated_sharding",
]
