"""IterativeSAAA — SAAA encoder (LSTM question + glimpse attention) with a
transformer decoder (generative).

Parity: /root/reference/models/iterative_saaa.py:60-132 (CoAttention :12-28,
TextProcessor :30-58, apply_attention :94-102 — the glimpse weights are
softmaxed per glimpse and *summed over glimpses* to scale each region).
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..builders import (
    META_ARCHITECTURE,
    build_decoder,
    build_vision_embedding,
)
from .base import BatchArrays, GenerativeModel
from .modules.ffn import PositionWiseFeedForward
from .modules.masks import padding_bias
from .saaa import CoAttention

_xavier = nn.initializers.xavier_uniform()


class TextProcessor(nn.Module):
    """Embed -> dropout -> tanh -> LSTM, returning the final cell state
    (iterative_saaa.py:30-58 parity)."""

    config: Any
    vocab: Any

    @nn.compact
    def __call__(self, tokens: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        table = self.param(
            "embedding", _xavier, (len(self.vocab), self.config.D_EMBEDDING)
        )
        table = table.at[self.vocab.padding_idx].set(0.0)
        embedded = jnp.take(table, tokens, axis=0)
        embedded = nn.Dropout(rate=self.config.DROPOUT)(
            embedded, deterministic=not train
        )
        embedded = jnp.tanh(embedded)
        rnn = nn.RNN(nn.OptimizedLSTMCell(self.config.D_MODEL), return_carry=True)
        (cell, _hidden), _ = rnn(embedded)
        return cell


@META_ARCHITECTURE.register()
class IterativeSAAA(GenerativeModel):
    config: Any
    vocab: Any

    def setup(self):
        self.d_model = self.config.D_MODEL
        self.vision = build_vision_embedding(self.config.VISION_PROCESSOR)
        self.text = TextProcessor(self.config.TEXT_PROCESSOR, self.vocab)
        self.attention = CoAttention(self.config.ATTENTION)
        self.fusion = PositionWiseFeedForward(self.config.MULTIMODAL_FUSION)
        self.norm = nn.LayerNorm()
        self.decoder = build_decoder(self.config.DECODER, vocab=self.vocab)

    def encode(self, batch: BatchArrays, train: bool = False):
        v, v_bias = self.vision(batch["region_features"], train=train)
        q = self.text(batch["question_tokens"], train=train)  # (bs, d)
        q_bias = padding_bias(q[:, None, :], padding_idx=self.vocab.padding_idx)

        v = v / (jnp.linalg.norm(v, axis=1, keepdims=True) + 1e-8)
        glimpse_logits = self.attention(v, q, train=train)  # (bs, R, g)
        # per-glimpse softmax over regions, summed over glimpses, scales each
        # region (iterative_saaa.py:94-102 semantics)
        scale = jnp.sum(jax.nn.softmax(glimpse_logits, axis=1), axis=-1)
        v = v * scale[..., None]

        combined = jnp.concatenate([v, q[:, None, :]], axis=1)
        combined_bias = jnp.concatenate([v_bias, q_bias], axis=-1)
        combined = self.fusion(combined, train=train)
        # zero out padded positions post-fusion (iterative_saaa.py:121)
        keep = (combined_bias[:, 0, 0, :] == 0)[..., None]
        combined = self.norm(combined * keep)
        return combined, combined_bias

    def __call__(self, batch: BatchArrays, train: bool = False) -> jnp.ndarray:
        encoder_features, encoder_bias = self.encode(batch, train=train)
        # the reference applies log_softmax twice here (decoder already
        # returns log-probs, iterative_saaa.py:132) — idempotent for argmax
        # and equivalent for NLL up to a constant; we return the decoder's
        return self.decoder(
            answer_tokens=batch["answer_tokens"],
            encoder_features=encoder_features,
            encoder_attention_bias=encoder_bias,
            train=train,
        )
