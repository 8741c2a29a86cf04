"""Device mesh + sharding policy.

The reference is single-device (SURVEY.md §2 preamble); the TPU rebuild
routes *all* parallelism decisions through this module so models never name
devices.  Round-1 policy: 1-D data parallelism — batch dim sharded over the
'data' axis, parameters replicated, XLA inserts the psum for gradients.
The mesh axes are declared here so TP ('model') can be added without
touching model code.
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec

DATA_AXIS = "data"


def get_mesh(n_devices: Optional[int] = None, devices=None) -> Mesh:
    """A 1-D data mesh over the available (or given) devices."""
    if devices is None:
        devices = jax.devices()
        if n_devices is not None:
            devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (DATA_AXIS,))


def shard_batch_spec(mesh: Mesh) -> NamedSharding:
    """Batch arrays: leading dim sharded over the data axis."""
    return NamedSharding(mesh, PartitionSpec(DATA_AXIS))


def replicate_spec(mesh: Mesh) -> NamedSharding:
    """Parameters/optimizer state: fully replicated."""
    return NamedSharding(mesh, PartitionSpec())


def shard_batch(batch_arrays: dict, mesh: Mesh) -> dict:
    """Device-put a dict of host arrays with batch-dim sharding."""
    spec = shard_batch_spec(mesh)
    return {k: jax.device_put(v, spec) for k, v in batch_arrays.items()}
