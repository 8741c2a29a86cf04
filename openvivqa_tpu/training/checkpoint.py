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

import numpy as np
from flax import serialization

LAST_NAME = "last_model.pth"
BEST_NAME = "best_model.pth"


def save_checkpoint(path: str, state_pytree: Any, metadata: Dict[str, Any]) -> None:
    payload = {
        "state": serialization.to_bytes(state_pytree),
        "metadata": metadata,
        "numpy_rng_state": np.random.get_state(),
    }
    tmp_path = path + ".tmp"
    with open(tmp_path, "wb") as handle:
        pickle.dump(payload, handle)
    os.replace(tmp_path, path)


def load_checkpoint(
    path: str, state_template: Any
) -> Optional[Dict[str, Any]]:
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
