"""Tensor (channel) parallelism over a 2-D ``(data, model)`` mesh.

The reference has no model parallelism at all (its distributed story is
single-process DataParallel, reference train.py:43-44); this module is the
TPU-native scaling capability beyond it: conv/dense parameters are sharded
over a ``model`` mesh axis on their output-channel dimension, batches stay
sharded over ``data``, and under ``jax.jit`` the GSPMD partitioner inserts
the collectives (all-gathers of channel-sharded activations feeding each
conv, psums for GroupNorm moments and for the data-parallel gradient
reduction) over ICI.

Sharding choice: every weight is sharded on its LAST axis (conv HWIO "O",
dense "O", rank-1 scale/bias on their only axis) whenever it divides by the
model-axis size.  This is plain Megatron-style column sharding applied
uniformly — each device holds 1/mp of every kernel, cutting both parameter
and optimizer-state memory by the model-axis size, which is what enables
models wider than one chip's HBM.  Because optimizer moments (Adam mu/nu)
mirror parameter shapes, the same shape-based rule places them consistently.

Used by ``train.py`` (``trainer.model_parallel`` config key),
``__graft_entry__.dryrun_multichip`` and tests/test_tensor_parallel.py.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .mesh import DATA_AXIS

MODEL_AXIS = "model"


def make_mesh_2d(
    n_data: int,
    n_model: int,
    devices: Optional[Sequence] = None,
) -> Mesh:
    """A ``(data, model)`` mesh of ``n_data * n_model`` devices.

    The model axis is the fastest-varying one so that, on real slices,
    channel all-gathers/psums ride neighbouring ICI links.
    """
    devs = list(devices) if devices is not None else jax.devices()
    need = n_data * n_model
    if len(devs) < need:
        raise ValueError(f"need {need} devices, have {len(devs)}")
    grid = np.asarray(devs[:need]).reshape(n_data, n_model)
    return Mesh(grid, (DATA_AXIS, MODEL_AXIS))


def leaf_spec(leaf, n_model: int) -> P:
    """Partition spec for one parameter/optimizer-state leaf by shape.

    Channel-bearing arrays (last axis divisible by the model-axis size) are
    sharded there; everything else (scalars, odd-sized vectors such as the
    positional-encoding halves) is replicated.
    """
    shape = getattr(leaf, "shape", ())
    if len(shape) >= 1 and shape[-1] % n_model == 0 and shape[-1] >= n_model:
        return P(*([None] * (len(shape) - 1) + [MODEL_AXIS]))
    return P()


def state_shardings(tree: Any, mesh: Mesh) -> Any:
    """NamedShardings for a param / TrainState pytree under channel TP."""
    n_model = mesh.shape[MODEL_AXIS]
    return jax.tree_util.tree_map(
        lambda x: NamedSharding(mesh, leaf_spec(x, n_model)), tree
    )


def shard_state(tree: Any, mesh: Mesh) -> Any:
    """Device-put a param / TrainState pytree with channel-sharded weights."""
    return jax.tree_util.tree_map(
        jax.device_put, tree, state_shardings(tree, mesh)
    )
