"""TRAINING.USE_SCST: after patience runs out the task switches from XE to
self-critical training (the protocol the reference left commented out)."""

import os
import pickle

from openvivqa_tpu.builders import build_task, populate
from test_generative_e2e import _iterative_mcan_config


def test_scst_switch(synthetic_data, tmp_path):
    populate()
    config = _iterative_mcan_config(synthetic_data, tmp_path).merged(
        {
            "TRAINING": {"USE_SCST": True, "PATIENCE": 1, "MAX_EPOCHS": 3},
            "MODEL": {"NAME": "scst_switch_test"},
        }
    )
    task = build_task(config)
    task.start()

    ckpt = os.path.join(
        config.TRAINING.CHECKPOINT_PATH, config.MODEL.NAME, "last_model.pth"
    )
    with open(ckpt, "rb") as handle:
        metadata = pickle.load(handle)["metadata"]
    assert metadata["use_rl"] is True  # the switch happened
    assert task.epoch >= 2  # at least one SCST epoch ran

    # -- resume mid-RL-phase keeps the SCST progress ------------------------
    # A restart used to re-run the XE->RL transition (reload best, re-init
    # the optimizer), silently discarding every SCST epoch since the last
    # best promotion; resume must swap only the tx.
    import jax
    import numpy as np

    task2 = build_task(config)
    meta = task2.load_checkpoint(ckpt)
    assert meta["use_rl"] is True
    params_before = [np.asarray(x) for x in jax.tree.leaves(task2.state.params)]
    opt_before = [np.asarray(x) for x in jax.tree.leaves(task2.state.opt_state)]
    task2._switch_to_scst(resume=True)
    for a, b in zip(
        params_before, jax.tree.leaves(task2.state.params)
    ):
        np.testing.assert_array_equal(a, np.asarray(b))
    for a, b in zip(
        opt_before, jax.tree.leaves(task2.state.opt_state)
    ):
        np.testing.assert_array_equal(a, np.asarray(b))
