"""SAAA — Show, Ask, Attend, and Answer (classification head).

Parity: /root/reference/models/saaa.py:68-126 (CoAttention :11-27,
Classifier :59-66).  Differences, both documented:
* the reference feeds the LSTM's full output sequence where a pooled vector
  is required (its `q.unsqueeze(1).expand_as(v)` crashes on 3-D q); we pool
  the question to its final valid timestep — the architecture the commented
  TextProcessor (saaa.py:29-57) implements;
* glimpse-weighted pooling is one einsum instead of reshape gymnastics.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..builders import (
    META_ARCHITECTURE,
    build_text_embedding,
    build_vision_embedding,
)
from .common import total_answers_of
from .base import BatchArrays, ClassificationModel

_xavier = nn.initializers.xavier_uniform()


class CoAttention(nn.Module):
    """2-glimpse co-attention over region features (saaa.py:11-27)."""

    config: Any

    @nn.compact
    def __call__(self, v: jnp.ndarray, q: jnp.ndarray, train: bool = False):
        c = self.config
        deterministic = not train
        v_in = nn.Dropout(rate=c.DROPOUT)(v, deterministic=deterministic)
        q_in = nn.Dropout(rate=c.DROPOUT)(q, deterministic=deterministic)
        v_proj = nn.Dense(c.D_MODEL, use_bias=False, kernel_init=_xavier)(v_in)
        q_proj = nn.Dense(c.D_MODEL, kernel_init=_xavier)(q_in)
        x = nn.relu(v_proj + q_proj[:, None, :])
        x = nn.Dropout(rate=c.DROPOUT)(x, deterministic=deterministic)
        return nn.Dense(c.GLIMPSES, kernel_init=_xavier)(x)  # (bs, R, g)


@META_ARCHITECTURE.register()
class SAAA(ClassificationModel):
    config: Any
    vocab: Any

    def _pool_question(self, q_seq: jnp.ndarray, tokens: jnp.ndarray) -> jnp.ndarray:
        """Final valid LSTM state: gather each row's last non-pad timestep."""
        lengths = jnp.sum(
            (tokens != self.vocab.padding_idx).astype(jnp.int32), axis=-1
        )
        last = jnp.clip(lengths - 1, 0, q_seq.shape[1] - 1)
        return jnp.take_along_axis(q_seq, last[:, None, None], axis=1)[:, 0]

    @nn.compact
    def __call__(self, batch: BatchArrays, train: bool = False) -> jnp.ndarray:
        vision = build_vision_embedding(self.config.VISION_PROCESSOR)
        text = build_text_embedding(self.config.TEXT_PROCESSOR, self.vocab)
        attention = CoAttention(self.config.ATTENTION)

        v_raw = batch["region_features"]
        tokens = batch["question_tokens"]

        v, _ = vision(v_raw, train=train)
        q_seq, _ = text(tokens, train=train)
        q = self._pool_question(q_seq, tokens)

        # l2-normalise across the region axis (saaa.py:118 parity)
        v = v / (jnp.linalg.norm(v, axis=1, keepdims=True) + 1e-8)

        glimpse_logits = attention(v, q, train=train)  # (bs, R, g)
        weights = jax.nn.softmax(glimpse_logits, axis=1)
        pooled = jnp.einsum("brg,brd->bgd", weights, v)  # (bs, g, d)
        pooled = pooled.reshape(pooled.shape[0], -1)

        combined = jnp.concatenate([pooled, q], axis=1)
        deterministic = not train
        hidden = nn.Dropout(rate=0.5)(combined, deterministic=deterministic)
        hidden = nn.relu(nn.Dense(1024, kernel_init=_xavier)(hidden))
        hidden = nn.Dropout(rate=0.5)(hidden, deterministic=deterministic)
        logits = nn.Dense(total_answers_of(self.vocab), kernel_init=_xavier)(hidden)
        return jax.nn.log_softmax(logits, axis=-1)
