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
