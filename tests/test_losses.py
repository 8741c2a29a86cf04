"""Loss functions vs torch references (NLLLoss / BCEWithLogitsLoss)."""

import jax.numpy as jnp
import numpy as np
import pytest

from openvivqa_tpu.training.train_state import (
    bce_with_logits_loss,
    masked_bce_with_logits_loss,
    nll_loss,
)

torch = pytest.importorskip("torch")


def test_nll_loss_matches_torch():
    rng = np.random.default_rng(0)
    logits = rng.normal(size=(6, 11)).astype(np.float32)
    logprobs = logits - np.log(np.exp(logits).sum(-1, keepdims=True))
    targets = rng.integers(0, 11, size=(6,))
    targets[2] = 0  # ignored

    ours = float(nll_loss(jnp.asarray(logprobs), jnp.asarray(targets), 0))
    want = float(
        torch.nn.NLLLoss(ignore_index=0)(
            torch.tensor(logprobs), torch.tensor(targets)
        )
    )
    np.testing.assert_allclose(ours, want, rtol=1e-6)


def test_bce_with_logits_matches_torch():
    rng = np.random.default_rng(1)
    scores = rng.normal(size=(5, 9)).astype(np.float32)
    targets = rng.integers(0, 9, size=(5,))

    ours = float(bce_with_logits_loss(jnp.asarray(scores), jnp.asarray(targets)))
    one_hot = torch.zeros(5, 9)
    one_hot.scatter_(-1, torch.tensor(targets)[:, None], 1.0)
    want = float(
        torch.nn.functional.binary_cross_entropy_with_logits(
            torch.tensor(scores), one_hot, reduction="mean"
        )
    )
    np.testing.assert_allclose(ours, want, rtol=1e-6)


def test_masked_bce_reference_semantics():
    """training_mmf_task.py:18-37: losses on ignored rows zeroed; the sum is
    divided by the count of ignored rows (max 1)."""
    rng = np.random.default_rng(2)
    scores = rng.normal(size=(4, 6)).astype(np.float32)
    targets = np.array([1, 0, 3, 0])

    ours = float(
        masked_bce_with_logits_loss(jnp.asarray(scores), jnp.asarray(targets), 0)
    )
    one_hot = torch.zeros(4, 6)
    one_hot.scatter_(-1, torch.tensor(targets)[:, None], 1.0)
    losses = torch.nn.functional.binary_cross_entropy_with_logits(
        torch.tensor(scores), one_hot, reduction="none"
    )
    mask = torch.tensor(targets) == 0
    losses = losses.masked_fill(mask[:, None], 0.0)
    want = float(losses.sum() / torch.maximum(mask.sum(), torch.ones(())))
    np.testing.assert_allclose(ours, want, rtol=1e-6)
