"""Multi-host runtime helpers.

The reference is strictly single-process (SURVEY.md §2 preamble); the
TPU-native equivalent (§5.8): `initialize()` wires jax.distributed when a
coordinator is configured, and `gather_eval_dicts` merges per-host
generation/ground-truth dicts before the host-side metric computation.
"""

from __future__ import annotations

import os
import pickle
from typing import Dict, Tuple

import jax

from ..logging_utils import setup_logger

logger = setup_logger()


def initialize() -> None:
    """Initialise jax.distributed from env when running multi-host.

    Controlled by JAX_COORDINATOR_ADDRESS (+ optional JAX_NUM_PROCESSES /
    JAX_PROCESS_ID); a no-op single-host.
    """
    coordinator = os.environ.get("JAX_COORDINATOR_ADDRESS")
    if not coordinator:
        return
    kwargs = {"coordinator_address": coordinator}
    if os.environ.get("JAX_NUM_PROCESSES"):
        kwargs["num_processes"] = int(os.environ["JAX_NUM_PROCESSES"])
    if os.environ.get("JAX_PROCESS_ID"):
        kwargs["process_id"] = int(os.environ["JAX_PROCESS_ID"])
    jax.distributed.initialize(**kwargs)
    logger.info(
        "jax.distributed initialised: process %d/%d, %d devices",
        jax.process_index(), jax.process_count(), jax.device_count(),
    )


def is_primary() -> bool:
    return jax.process_index() == 0


def gather_eval_dicts(
    gts: Dict, gens: Dict
) -> Tuple[Dict, Dict]:
    """Merge per-host eval dicts onto every host (metrics are host-side
    string ops; SURVEY.md §5.8).  Single-process: identity.

    The dicts carry Python strings, which `process_allgather` cannot ship
    directly (it only supports array pytrees), so each host pickles its
    (gts, gens) pair into a uint8 blob, blobs are right-padded to the
    all-host max length, gathered, then sliced back and unpickled.
    """
    if jax.process_count() == 1:
        return gts, gens
    blobs = _allgather_blobs(pickle.dumps((gts, gens)))
    merged_gts, merged_gens = {}, {}
    for blob in blobs:
        host_gts, host_gens = pickle.loads(blob)
        # RAW keys, no host prefix: callers key by global sample id
        # (BaseTask.eval_key), so the duplicate batches that loader
        # sharding wraps in at the uneven tail land on the SAME key and
        # are scored once — a host prefix would double-count them
        merged_gts.update(host_gts)
        merged_gens.update(host_gens)
    return merged_gts, merged_gens


def _allgather_blobs(payload: bytes) -> list:
    """All-gather one bytes payload per host; returns process_count blobs
    in process order.  Two collectives: lengths, then max-padded bodies
    (process_allgather stacks along a new leading host axis)."""
    import numpy as np
    from jax.experimental import multihost_utils

    length = np.asarray(len(payload), np.int64)
    lengths = np.asarray(
        multihost_utils.process_allgather(length)
    ).reshape(-1)
    max_len = int(lengths.max())
    padded = np.zeros((max_len,), np.uint8)
    padded[: len(payload)] = np.frombuffer(payload, np.uint8)
    gathered = np.asarray(multihost_utils.process_allgather(padded))
    gathered = gathered.reshape(len(lengths), max_len)
    return [
        gathered[i, : int(lengths[i])].tobytes() for i in range(len(lengths))
    ]
