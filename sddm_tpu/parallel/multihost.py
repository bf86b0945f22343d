"""Multi-host data-parallel helpers.

The reference's only multi-node artifact is a vestigial DistributedSampler
hook (data_loader/numpy_dataset.py:12,87-95 — never enabled).  The TPU-native
equivalent: each host loads its shard of the batch and assembles a global
array with ``jax.make_array_from_process_local_data`` (SURVEY.md §2.8).

Single-controller JAX: these helpers are no-ops on one host and shard
correctly under ``jax.distributed.initialize`` on pods.
"""

from __future__ import annotations

from typing import Any, Iterator

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .mesh import DATA_AXIS


def process_shard_indices(n_samples: int) -> np.ndarray:
    """The dataset indices this host is responsible for (round-robin by
    process, DistributedSampler-style).

    Every host receives EXACTLY ``ceil(n / P)`` indices: when ``n`` is not
    divisible by the process count the tail is padded by wrapping around to
    the start (torch DistributedSampler's padding semantics).  Equal shard
    sizes are a liveness requirement — with unequal shards ``len(loader)``
    differs across hosts and the SPMD train loop deadlocks on the final
    step (hosts that ran out stop issuing collectives)."""
    p = jax.process_count()
    per_host = -(-n_samples // p)  # ceil
    padded = np.arange(p * per_host) % n_samples
    return padded[jax.process_index()::p]


def global_batch_from_local(
    local_batch: Any, mesh: Mesh, axis_name: str = DATA_AXIS
) -> Any:
    """Assemble a globally-sharded batch from each host's local shard.

    ``local_batch`` is this host's ``[local_B, ...]`` numpy pytree; the
    result is a jax.Array pytree with global batch axis ``local_B *
    process_count`` sharded over the mesh.
    """
    sharding = NamedSharding(mesh, P(axis_name))

    def make(x):
        x = np.asarray(x)
        return jax.make_array_from_process_local_data(sharding, x)

    return jax.tree_util.tree_map(make, local_batch)


class PerHostLoader:
    """Wrap a host-side loader so each process iterates only its shard and
    yields globally-sharded device batches."""

    def __init__(self, dataset, batch_size: int, mesh: Mesh,
                 collate_fn=None, seed: int = 0):
        from ..data.loaders import BaseDataLoader, default_collate

        if batch_size % jax.process_count() != 0:
            raise ValueError(
                f"global batch {batch_size} not divisible by "
                f"{jax.process_count()} processes"
            )
        local_bs = batch_size // jax.process_count()
        self.mesh = mesh
        self._loader = BaseDataLoader(
            dataset,
            local_bs,
            collate_fn=collate_fn or default_collate,
            seed=seed,
            _indices=process_shard_indices(len(dataset)),
            _epoch_shuffle=True,
        )
        self.batch_size = batch_size

    def __len__(self):
        return len(self._loader)

    def __iter__(self) -> Iterator:
        for batch in self._loader:
            yield global_batch_from_local(batch, self.mesh)
