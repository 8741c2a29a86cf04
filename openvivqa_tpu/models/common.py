"""Shared model heads: attention-reduce pooling + fused classification.

The reference repeats an identical MLP/softmax-pool/proj/LN/classify block
across six architectures (mcan.py:12-25 + vanilla_transformer.py:40-63,
parallel_attention_transformer.py, cross_modality_transformer.py,
visiolinguistic_transformer.py, hierarchical_co_attention.py); here it is
one module.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

_xavier = nn.initializers.xavier_uniform()


class AttentionReduceMLP(nn.Module):
    """Dense -> ReLU -> dropout -> Dense(1): per-token pooling logits."""

    config: Any

    @nn.compact
    def __call__(self, features: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        hidden = nn.relu(nn.Dense(self.config.D_MODEL, kernel_init=_xavier)(features))
        hidden = nn.Dropout(rate=self.config.DROPOUT)(hidden, deterministic=not train)
        return nn.Dense(1, kernel_init=_xavier)(hidden)


def attention_pool(features: jnp.ndarray, logits: jnp.ndarray) -> jnp.ndarray:
    """softmax(logits over tokens) - weighted sum (mcan.py:70-77 parity)."""
    weights = jax.nn.softmax(logits, axis=1)
    return jnp.sum(features * weights, axis=1)


def total_answers_of(vocab) -> int:
    """Classifier width; some reference configs pair classification models
    with generative vocabs (e.g. cross_modality_transformer_vlsp.yaml +
    VlspVqaMultiModalVocab, a latent crash) — fall back to the token vocab."""
    return getattr(vocab, "total_answers", None) or len(vocab)


class DualStreamClassifier(nn.Module):
    """vision/text attr-reduce + projected fusion + LN + classify."""

    config: Any
    n_answers: int

    @nn.compact
    def __call__(
        self,
        vision_features: jnp.ndarray,
        text_features: jnp.ndarray,
        train: bool = False,
    ) -> jnp.ndarray:
        c = self.config
        pooled_v = attention_pool(
            vision_features,
            AttentionReduceMLP(c.VISION_ATTR_REDUCE)(vision_features, train=train),
        )
        pooled_t = attention_pool(
            text_features,
            AttentionReduceMLP(c.TEXT_ATTR_REDUCE)(text_features, train=train),
        )
        fused = nn.LayerNorm()(
            nn.Dense(c.D_MODEL, kernel_init=_xavier)(pooled_v)
            + nn.Dense(c.D_MODEL, kernel_init=_xavier)(pooled_t)
        )
        return nn.Dense(self.n_answers, kernel_init=_xavier)(fused)
