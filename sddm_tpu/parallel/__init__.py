from .mesh import (
    DATA_AXIS,
    make_mesh,
    replicate,
    shard_batch,
    batch_sharding,
    replicated_sharding,
)
from .tensor import (
    MODEL_AXIS,
    make_mesh_2d,
    shard_state,
    state_shardings,
)

__all__ = [
    "DATA_AXIS",
    "MODEL_AXIS",
    "make_mesh",
    "make_mesh_2d",
    "replicate",
    "shard_batch",
    "shard_state",
    "state_shardings",
    "batch_sharding",
    "replicated_sharding",
]
