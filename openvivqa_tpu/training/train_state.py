"""Train state pytree + loss functions."""

from __future__ import annotations

from typing import Any, Callable, Dict

import jax
import jax.numpy as jnp
from flax import struct


class TrainState(struct.PyTreeNode):
    """Replicated training state; `apply_fn`/`tx` are static closures."""

    step: jnp.ndarray
    params: Any
    frozen: Any
    opt_state: Any
    apply_fn: Callable = struct.field(pytree_node=False)
    tx: Any = struct.field(pytree_node=False)

    def apply_gradients(self, grads):
        updates, new_opt_state = self.tx.update(grads, self.opt_state, self.params)
        import optax

        new_params = optax.apply_updates(self.params, updates)
        return self.replace(
            step=self.step + 1, params=new_params, opt_state=new_opt_state
        )

    @classmethod
    def create(cls, apply_fn, params, frozen, tx):
        return cls(
            step=jnp.zeros((), jnp.int32),
            params=params,
            frozen=frozen,
            opt_state=tx.init(params),
            apply_fn=apply_fn,
            tx=tx,
        )

    def variables(self) -> Dict[str, Any]:
        out = {"params": self.params}
        if self.frozen:
            out["frozen"] = self.frozen
        return out


def bce_with_logits_loss(
    scores: jnp.ndarray, targets: jnp.ndarray, weights=None
) -> jnp.ndarray:
    """BCEWithLogitsLoss(reduction='mean') over one-hot targets
    (classification_task.py:20-31 / mmf_classification_task.py:20-31).
    `weights`: optional (bs,) row validity — padded batch rows contribute
    neither loss nor denominator (the canonical copy MmfClassificationTask
    calls; it used to re-implement the formula inline)."""
    one_hot = jax.nn.one_hot(targets, scores.shape[-1], dtype=scores.dtype)
    losses = (
        jnp.maximum(scores, 0)
        - scores * one_hot
        + jnp.log1p(jnp.exp(-jnp.abs(scores)))
    )
    if weights is None:
        return jnp.mean(losses)
    weights = weights.astype(scores.dtype)[:, None]
    return jnp.sum(losses * weights) / jnp.maximum(
        jnp.sum(weights) * scores.shape[-1], 1.0
    )


def masked_bce_with_logits_loss(
    scores: jnp.ndarray, targets: jnp.ndarray, ignore_index: int
) -> jnp.ndarray:
    """BCEWithMaskLogitsLoss (training_mmf_task.py:18-37): per-position BCE
    on one-hot targets, rows whose target == ignore_index zeroed, summed and
    divided by the number of *masked* rows (the reference's quirk: it counts
    the ignored rows, max'd with 1) — kept bit-faithful.

    Deliberately call-site-free, like the reference: it defines this loss
    and comments it out of use (training_mmf_task.py:44); kept as the
    parity artifact SURVEY.md §2.2 inventories."""
    one_hot = jax.nn.one_hot(targets, scores.shape[-1], dtype=scores.dtype)
    losses = (
        jnp.maximum(scores, 0)
        - scores * one_hot
        + jnp.log1p(jnp.exp(-jnp.abs(scores)))
    )
    ignored = (targets == ignore_index).astype(scores.dtype)
    losses = losses * (1.0 - ignored)[..., None]
    count = jnp.maximum(jnp.sum(ignored), 1.0)
    return jnp.sum(losses) / count


def nll_loss(
    logprobs: jnp.ndarray,
    targets: jnp.ndarray,
    ignore_index: int,
    weights: jnp.ndarray = None,
) -> jnp.ndarray:
    """NLLLoss(ignore_index=pad, reduction='mean') over log-probabilities
    (base_task.py:48 parity): mean of -logp[target] over non-ignored
    elements.  logprobs (N, V), targets (N,); optional per-element `weights`
    (e.g. sample_valid broadcast over tokens) additionally zero out
    batch-padding rows."""
    gathered = jnp.take_along_axis(logprobs, targets[..., None], axis=-1)[..., 0]
    valid = (targets != ignore_index).astype(logprobs.dtype)
    if weights is not None:
        valid = valid * jnp.broadcast_to(
            weights.reshape(weights.shape + (1,) * (valid.ndim - weights.ndim)),
            valid.shape,
        )
    total = jnp.sum(valid)
    return -jnp.sum(gathered * valid) / jnp.maximum(total, 1.0)
