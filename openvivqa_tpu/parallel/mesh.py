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
MODEL_AXIS = "model"


def get_mesh(n_devices: Optional[int] = None, devices=None) -> Mesh:
    """A 1-D data mesh over the available (or given) devices."""
    if devices is None:
        devices = jax.devices()
        if n_devices is not None:
            devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (DATA_AXIS,))


def get_mesh_2d(
    n_devices: Optional[int] = None, model_parallel: int = 1, devices=None
) -> Mesh:
    """A (data, model) mesh: batch over 'data', tensor-parallel shards over
    'model'.  model_parallel=1 degenerates to pure DP."""
    if devices is None:
        devices = jax.devices()
        if n_devices is not None:
            devices = devices[:n_devices]
    devices = np.asarray(devices)
    assert devices.size % model_parallel == 0, (
        f"{devices.size} devices not divisible by model_parallel="
        f"{model_parallel}"
    )
    grid = devices.reshape(devices.size // model_parallel, model_parallel)
    return Mesh(grid, (DATA_AXIS, MODEL_AXIS))


def param_partition_spec(param: "jax.Array", mesh: Mesh) -> PartitionSpec:
    """Tensor-parallel placement rule (SURVEY.md §5.8: all sharding routed
    through this module).  Large 2-D kernels shard their output dim over the
    'model' axis (column parallel — XLA/GSPMD inserts the collectives);
    everything else replicates.  With no 'model' axis this is a no-op."""
    model_size = dict(zip(mesh.axis_names, mesh.devices.shape)).get(MODEL_AXIS, 1)
    if model_size <= 1:
        return PartitionSpec()
    if (
        getattr(param, "ndim", 0) == 2
        and param.shape[-1] % model_size == 0
        and param.shape[-1] >= 2 * model_size
        and param.shape[0] >= 8
    ):
        return PartitionSpec(None, MODEL_AXIS)
    return PartitionSpec()


def _axis_size(mesh: Mesh, axis: str) -> int:
    return dict(zip(mesh.axis_names, mesh.devices.shape)).get(axis, 1)


def state_partition_spec(
    leaf: "jax.Array", mesh: Mesh, fsdp: bool = False
) -> PartitionSpec:
    """Placement rule for whole-TrainState leaves (params AND mirrored
    optimizer moments — the rule is shape-based so adam mu/nu land exactly
    like their params).  Tensor-parallel column sharding first; with
    ``fsdp`` the remaining big matrices shard their first dim over the
    'data' axis (GSPMD all-gathers them per-layer — ZeRO-3 semantics);
    scalars and small leaves replicate."""
    spec = param_partition_spec(leaf, mesh)
    data_size = _axis_size(mesh, DATA_AXIS)
    fsdp_dim0 = (
        fsdp
        and data_size > 1
        and getattr(leaf, "ndim", 0) >= 2
        and leaf.shape[0] % data_size == 0
        and leaf.shape[0] >= 2 * data_size
        and leaf.size >= 1024
    )
    if spec == PartitionSpec(None, MODEL_AXIS):
        # combined layout: storage sharded over data, compute over model
        return PartitionSpec(DATA_AXIS, MODEL_AXIS) if fsdp_dim0 else spec
    if fsdp_dim0:
        return PartitionSpec(DATA_AXIS)
    return spec


def shard_state(state, mesh: Mesh, fsdp: bool = False):
    """device_put every TrainState leaf with its placement (params,
    optimizer moments, counters)."""
    return jax.tree.map(
        lambda leaf: jax.device_put(
            leaf, NamedSharding(mesh, state_partition_spec(leaf, mesh, fsdp))
        ),
        state,
    )


def shard_params(params, mesh: Mesh):
    """device_put every leaf with its tensor-parallel placement."""
    return jax.tree.map(
        lambda p: jax.device_put(p, NamedSharding(mesh, param_partition_spec(p, mesh))),
        params,
    )


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
