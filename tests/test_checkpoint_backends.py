"""Checkpoint backends: flax-msgpack default and the orbax option both
roundtrip a train state + metadata."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from openvivqa_tpu.training.checkpoint import load_checkpoint, save_checkpoint
from openvivqa_tpu.training.optim import constant_lambda_schedule, make_optimizer
from openvivqa_tpu.training.train_state import TrainState


def _state():
    params = {"dense": {"kernel": jnp.arange(6.0).reshape(2, 3)}}
    tx = make_optimizer(constant_lambda_schedule(0.1))
    return TrainState.create(lambda *a, **k: None, params, {}, tx)


def _roundtrip(tmp_path):
    state = _state()
    state = state.replace(step=state.step + 7)
    path = str(tmp_path / "last_model.pth")
    save_checkpoint(path, state, {"epoch": 3, "best_val_score": 0.5})

    template = _state()
    result = load_checkpoint(path, template)
    assert result["metadata"]["epoch"] == 3
    np.testing.assert_allclose(
        np.asarray(result["state"].params["dense"]["kernel"]),
        np.arange(6.0).reshape(2, 3),
    )
    assert int(result["state"].step) == 7


def test_flax_backend(tmp_path, monkeypatch):
    monkeypatch.delenv("OPENVIVQA_CKPT_BACKEND", raising=False)
    _roundtrip(tmp_path)


def test_orbax_backend(tmp_path, monkeypatch):
    pytest.importorskip("orbax.checkpoint")
    monkeypatch.setenv("OPENVIVQA_CKPT_BACKEND", "orbax")
    _roundtrip(tmp_path)
    assert os.path.isdir(str(tmp_path / "last_model.pth.orbax"))
