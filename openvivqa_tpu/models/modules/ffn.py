"""Position-wise feed-forward with post-LN residual
(parity: /root/reference/models/modules/positionwise_feed_forward.py:5-28;
GELU is the exact erf form, matching torch's nn.GELU default)."""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

_xavier = nn.initializers.xavier_uniform()


class PositionWiseFeedForward(nn.Module):
    config: Any

    @nn.compact
    def __call__(self, inputs: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        c = self.config
        hidden = nn.Dense(c.D_FF, kernel_init=_xavier)(inputs)
        hidden = jax.nn.gelu(hidden, approximate=False)
        hidden = nn.Dropout(rate=c.DROPOUT)(hidden, deterministic=not train)
        out = nn.Dense(c.D_MODEL, kernel_init=_xavier)(hidden)
        out = nn.Dropout(rate=c.DROPOUT)(out, deterministic=not train)
        return nn.LayerNorm()(inputs + out)
