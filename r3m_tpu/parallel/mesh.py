"""Device-mesh and sharding helpers for SPMD data-parallel training.

The reference's only parallelism is single-process `torch.nn.DataParallel`
(``/root/reference/r3m/train_representation.py:30``): scatter the batch,
replicate the model, compute the loss on the gathered global batch. The
TPU-native equivalent is a 1-D ``dp`` mesh over ICI with the train step
written as a *global-batch* program under `jit`: parameters replicated,
batch sharded on axis 0, and XLA's GSPMD partitioner inserting the
all-gathers for cross-video negative shuffles and the psums for gradient
reduction. A second (outer) ``dcn`` axis can be layered for multi-slice
scale-out without touching the step function.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

Pytree = Any

DATA_AXIS = "dp"


def make_mesh(
    n_devices: Optional[int] = None,
    devices: Optional[Sequence[jax.Device]] = None,
    axis_name: str = DATA_AXIS,
) -> Mesh:
    """1-D data-parallel mesh over the first `n_devices` local devices."""
    if devices is None:
        devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (axis_name,))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def batch_sharded(mesh: Mesh, axis_name: str = DATA_AXIS) -> NamedSharding:
    """Shard leading (batch) dimension across the dp axis."""
    return NamedSharding(mesh, P(axis_name))


def shard_batch(mesh: Mesh, batch: Pytree, axis_name: str = DATA_AXIS) -> Pytree:
    """device_put every leaf with its batch axis split across the mesh."""
    sharding = batch_sharded(mesh, axis_name)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sharding), batch)


def replicate(mesh: Mesh, tree: Pytree) -> Pytree:
    sharding = replicated(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sharding), tree)
