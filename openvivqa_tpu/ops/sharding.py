"""Data-parallel shard_map routing for the Pallas kernels.

Every pallas_call in this package is batch-grid and embarrassingly
data-parallel, but GSPMD treats a pallas_call as an opaque op: under a
sharded-batch jit it would replicate the call (all-gathering the full
batch onto every chip) or fail to partition — silently erasing the
single-chip kernel wins exactly where the parallelism matters
(VERDICT r4 item 4).  The fix: when a multi-device mesh is registered,
each kernel's public wrapper routes through `shard_map` over the 'data'
axis — every chip runs the kernel on its local batch shard, weights
replicated, zero collectives inside the kernel.

The mesh is REGISTERED, not discovered: models never name devices
(architecture invariant — all sharding goes through parallel/mesh.py),
so the task layer / dryrun registers its mesh here once
(`set_kernel_mesh`) and the wrappers consult `kernel_mesh(bs)` at trace
time.  Single-device meshes and batch sizes the data axis does not
divide fall back to the unwrapped call.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
from jax.sharding import Mesh, PartitionSpec

DATA_AXIS = "data"  # keep equal to parallel/mesh.py (no import: ops layer)

_kernel_mesh: Optional[Mesh] = None
_suspended: bool = False


def set_kernel_mesh(mesh: Optional[Mesh]) -> None:
    """Register (or clear, with None) the mesh kernels shard over.  Called
    by the task layer after mesh construction and by dryrun/tests."""
    global _kernel_mesh
    _kernel_mesh = mesh


def get_kernel_mesh() -> Optional[Mesh]:
    return _kernel_mesh


def kernel_mesh(batch_size: int) -> Optional[Mesh]:
    """The registered mesh iff kernels should shard: a 'data' axis of
    size > 1 that divides the batch, and not already inside a shard_map
    region (the per-shard re-entry must run the local kernel)."""
    if _suspended or _kernel_mesh is None:
        return None
    sizes = dict(zip(_kernel_mesh.axis_names, _kernel_mesh.devices.shape))
    data = sizes.get(DATA_AXIS, 1)
    if data <= 1 or batch_size % data:
        return None
    return _kernel_mesh


def data_shard_map(fn, mesh: Mesh, in_specs, out_specs):
    """shard_map over the data axis with re-entry suspended inside the
    body (the public wrappers call kernel_mesh again on the per-shard
    batch — without the guard they would recurse).  check_rep=False: the
    bodies contain pallas_calls, for which replication checking has no
    rule."""

    @functools.wraps(fn)
    def body(*args):
        global _suspended
        _suspended = True
        try:
            return fn(*args)
        finally:
            _suspended = False

    # jax.shard_map is the public name on new jax (check_vma there); fall
    # back to the experimental module (check_rep) on older versions
    try:
        shard_map = jax.shard_map
        kw = {"check_vma": False}
    except AttributeError:  # pragma: no cover - old jax
        from jax.experimental.shard_map import shard_map

        kw = {"check_rep": False}
    return shard_map(
        body, mesh=mesh, in_specs=in_specs, out_specs=out_specs, **kw
    )


# Shorthands for spec construction at the call sites.
P = PartitionSpec
BATCH = P(DATA_AXIS)  # leading-dim batch operands
BATCH_DIM1 = P(None, DATA_AXIS)  # (nj, bs, chunk) bias layouts
REP = P()  # weights / scalars
