"""Model base classes.

TPU-native counterparts of /root/reference/models/base_classification.py:5-17,
base_transformer.py:8-54 and base_unique_transformer.py:8-70.  Models are
flax.linen modules taking a dict of batch arrays (the device half of a
`Batch`); statefulness is externalised: generative models expose
`encode` / `decode_step` and the beam-search engine in training/decode.py
carries the cache pytree through `lax.scan`.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax.numpy as jnp
from flax import linen as nn

BatchArrays = Dict[str, jnp.ndarray]


class ClassificationModel(nn.Module):
    """Answer-classification models: __call__ -> (bs, n_answers) log-probs."""

    config: Any
    vocab: Any

    def __call__(self, batch: BatchArrays, train: bool = False) -> jnp.ndarray:
        raise NotImplementedError


class GenerativeModel(nn.Module):
    """Encoder-decoder generative models (beam-searched at eval).

    __call__      : teacher-forcing log-probs (bs, L, V)
    encode        : (encoder_features, encoder_attention_bias)
    decode_step   : one-token decode, mutates the 'cache' collection
    """

    config: Any
    vocab: Any

    def __call__(self, batch: BatchArrays, train: bool = False) -> jnp.ndarray:
        raise NotImplementedError

    def encode(
        self, batch: BatchArrays, train: bool = False
    ) -> Tuple[jnp.ndarray, Optional[jnp.ndarray]]:
        raise NotImplementedError

    def decode_step(
        self,
        token: jnp.ndarray,
        encoder_features: jnp.ndarray,
        encoder_attention_bias: Optional[jnp.ndarray],
    ) -> jnp.ndarray:
        """Default: delegate to a `decoder` submodule's step()."""
        return self.decoder.step(token, encoder_features, encoder_attention_bias)

    def decode_teacher_forced(
        self,
        tokens: jnp.ndarray,
        encoder_features: jnp.ndarray,
        encoder_attention_bias: Optional[jnp.ndarray],
        train: bool = False,
    ) -> jnp.ndarray:
        """Full-sequence decode over given tokens (SCST re-scoring path)."""
        return self.decoder(
            tokens, encoder_features, encoder_attention_bias, train=train
        )

    @property
    def max_generation_length(self) -> int:
        return self.vocab.max_answer_length
