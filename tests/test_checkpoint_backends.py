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


def test_orbax_best_promotion(tmp_path, monkeypatch):
    """promote() must carry the .orbax state dir along with the metadata
    pickle, or load_checkpoint(best) falls into the flax branch (ADVICE r1)."""
    pytest.importorskip("orbax.checkpoint")
    monkeypatch.setenv("OPENVIVQA_CKPT_BACKEND", "orbax")
    from openvivqa_tpu.training.checkpoint import promote

    state = _state().replace(step=jnp.asarray(11))
    last = str(tmp_path / "last_model.pth")
    best = str(tmp_path / "best_model.pth")
    save_checkpoint(last, state, {"epoch": 1})
    promote(last, best)
    assert os.path.isdir(best + ".orbax")
    result = load_checkpoint(best, _state())
    assert int(result["state"].step) == 11

    # re-promotion overwrites a stale best dir
    state2 = _state().replace(step=jnp.asarray(12))
    save_checkpoint(last, state2, {"epoch": 2})
    promote(last, best)
    result = load_checkpoint(best, _state())
    assert int(result["state"].step) == 12


def test_flax_promotion(tmp_path, monkeypatch):
    monkeypatch.delenv("OPENVIVQA_CKPT_BACKEND", raising=False)
    from openvivqa_tpu.training.checkpoint import promote

    state = _state().replace(step=jnp.asarray(5))
    last = str(tmp_path / "last_model.pth")
    best = str(tmp_path / "best_model.pth")
    save_checkpoint(last, state, {"epoch": 0})
    promote(last, best)
    result = load_checkpoint(best, _state())
    assert int(result["state"].step) == 5
