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
