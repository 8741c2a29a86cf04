"""Checkpoint save/load.

Parity with /root/reference/tasks/base_task.py:78-112: a single
`last_model.pth` per model dir holding model/optimizer/schedule state, RNG
state and task extras (best_val_score, patience, epoch); best-model
promotion by file copy; resume-by-presence.  Serialisation is flax msgpack
for pytrees + pickle for host metadata instead of torch.save.
"""

from __future__ import annotations

import os
import pickle
from typing import Any, Dict, Optional

import jax
import numpy as np
from flax import serialization

LAST_NAME = "last_model.pth"
BEST_NAME = "best_model.pth"


def _backend() -> str:
    return os.environ.get("OPENVIVQA_CKPT_BACKEND", "flax").lower()


def promote(src_path: str, dst_path: str) -> None:
    """Copy a checkpoint file (best-model promotion, base_task.py:274-276
    parity).  Under the orbax backend the `.pth` file is only the host
    metadata pickle; the state lives in a sibling `.orbax` directory which
    must be copied too, otherwise load_checkpoint(best) falls back to the
    flax branch and fails.  Primary-process only in multi-host runs (the
    write sites are gated the same way — BaseTask.save_checkpoint)."""
    import shutil

    from ..parallel.multihost import is_primary

    if not is_primary():
        return
    shutil.copyfile(src_path, dst_path)
    src_orbax = _orbax_dir(src_path)
    if os.path.isdir(src_orbax):
        dst_orbax = _orbax_dir(dst_path)
        if os.path.isdir(dst_orbax):
            shutil.rmtree(dst_orbax)
        shutil.copytree(src_orbax, dst_orbax)


def save_checkpoint(
    path: str, state_pytree: Any, metadata: Dict[str, Any]
) -> None:
    if _backend() == "orbax":
        _save_orbax(path, state_pytree, metadata)
        return
    payload = {
        "state": serialization.to_bytes(state_pytree),
        "metadata": metadata,
        "numpy_rng_state": np.random.get_state(),
    }
    tmp_path = path + ".tmp"
    with open(tmp_path, "wb") as handle:
        pickle.dump(payload, handle)
    os.replace(tmp_path, path)
    # a stale .orbax sibling from an earlier OPENVIVQA_CKPT_BACKEND=orbax
    # run would shadow this pickle on the next load (load_checkpoint
    # dispatches on dir presence) and silently resume OLD weights with NEW
    # metadata — the pair must stay consistent
    stale = _orbax_dir(path)
    if os.path.isdir(stale):
        import shutil

        shutil.rmtree(stale)


def load_checkpoint(
    path: str, state_template: Any
) -> Optional[Dict[str, Any]]:
    if os.path.isdir(path + ".orbax"):
        return _load_orbax(path, state_template)
    if not os.path.exists(path):
        return None
    with open(path, "rb") as handle:
        payload = pickle.load(handle)
    state = serialization.from_bytes(state_template, payload["state"])
    try:
        np.random.set_state(payload["numpy_rng_state"])
    except (KeyError, ValueError):
        pass
    return {"state": state, "metadata": payload["metadata"]}


def _orbax_dir(path: str) -> str:
    return os.path.abspath(path + ".orbax")


def _save_orbax(path: str, state_pytree: Any, metadata: Dict[str, Any]) -> None:
    """Orbax backend (OPENVIVQA_CKPT_BACKEND=orbax); the `.pth` file stays
    a pickle of host metadata so `last/best` promotion-by-copy semantics
    still work.  State is gathered to host numpy on the primary process
    (single-controller semantics — a multi-host FSDP save would need
    all-process participation; re-sharded RESUME from a full host
    checkpoint is what test_task_sharding pins).

    Durability: the new state is written to a sibling tmp dir and swapped
    in (old renamed aside, new renamed into place) so a preemption
    mid-save never destroys the previous resumable checkpoint; the
    metadata pickle is replaced last."""
    import shutil

    import jax
    import orbax.checkpoint as ocp

    target = _orbax_dir(path)
    tmp = target + ".tmp"
    old = target + ".old"
    for leftover in (tmp, old):
        if os.path.isdir(leftover):
            shutil.rmtree(leftover)
    checkpointer = ocp.StandardCheckpointer()
    checkpointer.save(tmp, jax.tree.map(np.asarray, state_pytree))
    checkpointer.wait_until_finished()
    if os.path.isdir(target):
        os.rename(target, old)
    os.rename(tmp, target)
    if os.path.isdir(old):
        shutil.rmtree(old)
    tmp_pth = path + ".tmp"
    with open(tmp_pth, "wb") as handle:
        pickle.dump(
            {"metadata": metadata, "numpy_rng_state": np.random.get_state()},
            handle,
        )
    os.replace(tmp_pth, path)


def _load_orbax(path: str, state_template: Any) -> Optional[Dict[str, Any]]:
    import orbax.checkpoint as ocp

    if not os.path.exists(path):
        # .orbax dir without its metadata pickle (crash window): honor the
        # Optional contract like the flax branch instead of raising
        return None
    checkpointer = ocp.StandardCheckpointer()
    state = checkpointer.restore(
        _orbax_dir(path), target=jax.tree.map(np.asarray, state_template)
    )
    with open(path, "rb") as handle:
        payload = pickle.load(handle)
    try:
        np.random.set_state(payload["numpy_rng_state"])
    except (KeyError, ValueError):
        pass
    return {"state": state, "metadata": payload["metadata"]}

