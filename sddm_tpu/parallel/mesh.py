"""Device mesh + sharding helpers.

The reference's entire distributed story is single-process
``torch.nn.DataParallel`` over visible GPUs (train.py:43-44, SURVEY.md §2.8).
The TPU-native equivalent: a 1-D ``data`` mesh; batches are sharded over it
with a NamedSharding and parameters are replicated — under ``jax.jit`` XLA
then partitions the computation SPMD-style and all-reduces gradients over ICI
automatically.  No explicit collectives are needed at reference scale; the
helpers below are also used by multi-chip tests on a virtual CPU mesh.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"


def make_mesh(
    n_devices: Optional[int] = None,
    axis_name: str = DATA_AXIS,
    devices: Optional[Sequence] = None,
) -> Mesh:
    """Build a 1-D data-parallel mesh over the first ``n_devices`` devices."""
    devs = list(devices) if devices is not None else jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.asarray(devs), (axis_name,))


def batch_sharding(mesh: Mesh, axis_name: str = DATA_AXIS) -> NamedSharding:
    """Shard the leading (batch) axis across the mesh."""
    return NamedSharding(mesh, P(axis_name))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch: Any, mesh: Mesh, axis_name: str = DATA_AXIS) -> Any:
    """Device-put every array in a pytree with its batch axis sharded."""
    sharding = batch_sharding(mesh, axis_name)
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, sharding), batch
    )


def replicate(tree: Any, mesh: Mesh) -> Any:
    """Device-put a pytree fully replicated across the mesh."""
    sharding = replicated_sharding(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sharding), tree)
