"""MCAN — Deep Modular Co-Attention Network (classification head).

Parity: /root/reference/models/mcan.py:27-81 (MLP :12-25): LSTM question
encoder -> self-attention encoder on text, guided-attention encoder on
vision, softmax attention-reduce over both streams, projected fusion + LN,
linear classifier, log-softmax.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..builders import (
    META_ARCHITECTURE,
    build_encoder,
    build_text_embedding,
    build_vision_embedding,
)
from .common import AttentionReduceMLP, attention_pool, total_answers_of
from .base import BatchArrays, ClassificationModel

_xavier = nn.initializers.xavier_uniform()


@META_ARCHITECTURE.register()
class MCAN(ClassificationModel):
    config: Any
    vocab: Any

    def setup(self):
        self.d_model = self.config.D_MODEL
        self.text_embedding = build_text_embedding(
            self.config.TEXT_EMBEDDING, self.vocab
        )
        self.vision_embedding = build_vision_embedding(self.config.VISION_EMBEDDING)
        self.self_encoder = build_encoder(self.config.SELF_ENCODER)
        self.guided_encoder = build_encoder(self.config.GUIDED_ENCODER)
        self.vision_attr_reduce = AttentionReduceMLP(self.config.VISION_ATTR_REDUCE)
        self.text_attr_reduce = AttentionReduceMLP(self.config.TEXT_ATTR_REDUCE)
        self.vision_proj = nn.Dense(self.d_model, kernel_init=_xavier)
        self.text_proj = nn.Dense(self.d_model, kernel_init=_xavier)
        self.layer_norm = nn.LayerNorm()
        self.classify = nn.Dense(total_answers_of(self.vocab), kernel_init=_xavier)

    def __call__(self, batch: BatchArrays, train: bool = False) -> jnp.ndarray:
        vision_features, vision_bias = self.vision_embedding(
            batch["region_features"], train=train
        )
        text_features, (text_bias, _) = self.text_embedding(
            batch["question_tokens"], train=train
        )

        text_features = self.self_encoder(
            features=text_features, padding_bias=text_bias, train=train
        )
        vision_features = self.guided_encoder(
            vision_features=vision_features,
            vision_padding_bias=vision_bias,
            language_features=text_features,
            language_padding_bias=text_bias,
            train=train,
        )

        pooled_vision = attention_pool(
            vision_features, self.vision_attr_reduce(vision_features, train=train)
        )
        pooled_text = attention_pool(
            text_features, self.text_attr_reduce(text_features, train=train)
        )

        fused = self.layer_norm(
            self.vision_proj(pooled_vision) + self.text_proj(pooled_text)
        )
        return jax.nn.log_softmax(self.classify(fused), axis=-1)
